package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-5 governance/layout operators —
  * properties the value-level oracle can't see as *laws* (it only
  * checks one fixture's output): compaction bin bounds, CDC delete
  * semantics, skew-profile ordering, CF score bounds. */
class GovernanceOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("ly_compaction: bins are contiguous, conserve bytes, and only " +
    "close after crossing the target boundary") {
    val target = 4000L
    val rows = SparkEntry.queries("ly_compaction")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, bins) =>
      val ordered = bins.sortBy(_._2)
      // contiguity: bin ids 0..k with no gaps
      assert(ordered.map(_._2).toSeq == (0L until ordered.length).toSeq,
        s"$src bins not contiguous: ${ordered.map(_._2).mkString(",")}")
      // greedy close law: a bin only ends because its cumulative end
      // offset crossed the boundary (the straddling file opens the
      // next bin) — every non-final bin's end >= (bin+1) * target
      var end = 0L
      ordered.dropRight(1).foreach { case (_, bin, bytes) =>
        end += bytes
        assert(end >= (bin + 1) * target,
          s"$src bin $bin closed early: end=$end < ${(bin + 1) * target}")
      }
    }
    // byte conservation: every file landed in exactly one bin
    val planned = rows.map(_._3).sum
    val total = graft.io.Tables(spark, dir, "documents")
      .agg(sum(col("n_chars"))).first().getLong(0)
    assert(planned == total, s"planned $planned != source $total")
  }

  test("j13_cdc_apply: deleted keys vanish, survivors carry the latest value") {
    val out = SparkEntry.queries("j13_cdc_apply")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // independent reference: latest event per user via a max_by over
    // the full stream (same unique (ts, event_id) ordering)
    val last = graft.io.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(expr("max_by(event_type, struct(ts, event_id))").as("t"),
        expr("round(max_by(value, struct(ts, event_id)), 2)").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val deleted = last.filter(_._2 == "error").map(_._1).toSet
    val kept = last.filterNot(r => deleted(r._1))
    assert(deleted.nonEmpty, "fixture has no trailing-error user; weak test")
    deleted.foreach(u => assert(!out.contains(u), s"deleted user $u survived"))
    kept.foreach { case (u, _, v) =>
      assert(out.get(u).contains(v), s"user $u: got ${out.get(u)}, want $v")
    }
    assert(out.size == kept.size)
  }

  test("dq_skew: profile is internally consistent with the raw table") {
    val r = SparkEntry.queries("dq_skew")(spark, dir).first()
    val nRows = graft.io.Tables(spark, dir, "lineitem").count()
    assert(r.getAs[Long]("n_rows") == nRows)
    assert(r.getAs[Double]("top_share") > 0 && r.getAs[Double]("top_share") <= 1)
    assert(r.getAs[Double]("p99") >= r.getAs[Double]("p50"))
    assert(r.getAs[Double]("skew_ratio") >= 1.0)
  }

  test("a11_item_cf: cosine scores in (0, 1], support floor respected") {
    val rows = SparkEntry.queries("a11_item_cf")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("co_n") >= 3)
      val c = r.getAs[Double]("cosine")
      assert(c > 0 && c <= 1.0, s"cosine out of range: $c")
    }
  }

  test("mm_hash_dedup: copies conserve rows; keep_id is a group member minimum") {
    val out = SparkEntry.queries("mm_hash_dedup")(spark, dir)
    val total = out.agg(sum(col("n_copies"))).first().getLong(0)
    val docs = graft.io.Tables(spark, dir, "documents").count()
    assert(total == docs, s"copies $total != docs $docs")
    // keep ids are distinct doc ids (one representative per content)
    assert(out.select(col("keep_id")).distinct().count() == out.count())
  }
}
