package graft.scale

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k UDAF (SURVEY §4: "a custom Aggregator (top-k by
  * cosine) is the only likely typed-UDAF"). Keeps a bounded k-element
  * buffer per group with map-side partial aggregation — the
  * shuffle carries at most k rows per group per partition instead of
  * the whole group, which is what makes per-query top-k viable when a
  * group is billions of pairs.
  *
  * Ordering: score desc, then id asc — the same deterministic
  * tie-break as the window-based kNN, so results are interchangeable.
  */
object TopKAggregator {

  case class Scored(id: Long, score: Double)

  private def insert(buf: List[Scored], s: Scored, k: Int): List[Scored] = {
    // fast path: buffer full and the candidate doesn't beat the
    // current last element — return unchanged. At k=10 over billions
    // of rows virtually every input lands here; the general path's
    // per-row list re-sort would otherwise dominate the map side.
    if (buf.lengthCompare(k) >= 0) {
      val last = buf.last
      if (s.score < last.score ||
          (s.score == last.score && s.id >= last.id)) return buf
    }
    val merged = (s :: buf).sortBy(x => (-x.score, x.id))
    if (merged.length > k) merged.take(k) else merged
  }

  def topK(k: Int): Aggregator[Scored, List[Scored], Seq[Scored]] =
    new Aggregator[Scored, List[Scored], Seq[Scored]] {
      override def zero: List[Scored] = Nil
      override def reduce(b: List[Scored], a: Scored): List[Scored] =
        insert(b, a, k)
      override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
        b2.foldLeft(b1)((b, s) => insert(b, s, k))
      override def finish(r: List[Scored]): Seq[Scored] =
        r.sortBy(x => (-x.score, x.id))
      override def bufferEncoder: Encoder[List[Scored]] =
        ExpressionEncoder[List[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] =
        ExpressionEncoder[Seq[Scored]]()
    }
}
