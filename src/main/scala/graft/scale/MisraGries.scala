package graft.scale

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitters sketch as a typed Aggregator —
  * the candidate-pruning half of EXACT distributed heavy hitters.
  *
  * The k-counter MG summary guarantees every item with true frequency
  * > n/(k+1) still holds a counter after any stream order; the merge
  * (pointwise sum, then subtract the (k+1)-st largest counter and drop
  * non-positives — Agarwal et al., "Mergeable Summaries", PODS'12)
  * preserves that guarantee under Spark's arbitrary partial-agg tree.
  * Counter VALUES are approximate (undercounts); only the candidate
  * SET is used downstream: an exact recount restricted to the <= k
  * surviving candidates turns the sketch into an exact operator, the
  * same sketch-prunes/exact-verifies shape as the dedup and ANN packs.
  *
  * Scale: the corpus-wide token shuffle of a naive exact groupBy is
  * replaced by k-bounded partial summaries (map-side) + one recount
  * shuffle that carries ONLY candidate tokens — O(k) state per task
  * regardless of vocabulary size.
  */
object MisraGries {

  def sketch(k: Int): Aggregator[String, Map[String, Long], Seq[String]] =
    new Aggregator[String, Map[String, Long], Seq[String]] {
      override def zero: Map[String, Long] = Map.empty

      override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
        if (b.contains(t) || b.size < k) b.updated(t, b.getOrElse(t, 0L) + 1L)
        else b.flatMap { case (key, c) => // decrement-all, drop zeros
          if (c > 1) Some(key -> (c - 1)) else None
        }

      override def merge(a: Map[String, Long],
                         b: Map[String, Long]): Map[String, Long] = {
        val sum = (a.keySet ++ b.keySet).iterator
          .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L)))
          .toMap
        if (sum.size <= k) sum
        else {
          val cut = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
          sum.flatMap { case (key, c) =>
            if (c - cut > 0) Some(key -> (c - cut)) else None
          }
        }
      }

      override def finish(b: Map[String, Long]): Seq[String] =
        b.keys.toSeq.sorted

      override def bufferEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
    }
}
