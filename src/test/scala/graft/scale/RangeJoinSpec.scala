package graft.scale

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private def eventsSides(dir: String) = {
    val ev = Tables.events(spark, dir)
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("interval_id"), col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("end_ts"))
    val points = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("point_id"), col("ts").as("p_ts"))
    (intervals, points)
  }

  test("binned range join == naive theta join, across bucket widths") {
    val (intervals, points) = eventsSides(sf("sf0.001"))
    val naive = intervals.join(points,
        col("p_ts") >= col("start_ts") && col("p_ts") < col("end_ts"))
      .select(col("interval_id"), col("point_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(naive.nonEmpty)
    // widths below, at, and above the interval length — same answer,
    // and no duplicate pairs from multi-bucket interval replication
    for (w <- Seq(60L, 600L, 3600L)) {
      val binned = RangeJoin
        .pointInInterval(intervals, points, "start_ts", "end_ts", "p_ts", w)
        .select(col("interval_id"), col("point_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(binned == naive, s"bucketSeconds=$w")
    }
  }

  test("plan is an equi-join: no CartesianProduct / BroadcastNestedLoop") {
    val (intervals, points) = eventsSides(sf("sf0.001"))
    val plan = RangeJoin
      .pointInInterval(intervals, points, "start_ts", "end_ts", "p_ts", 600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // while the naive form without the bucket key is exactly that:
    val naivePlan = intervals.join(points,
        col("p_ts") >= col("start_ts") && col("p_ts") < col("end_ts"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin")
      || naivePlan.contains("CartesianProduct"))
  }

  test("boundary semantics: start inclusive, end exclusive") {
    import spark.implicits._
    val intervals = Seq((1L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"))
      .toDF("interval_id", "s", "e")
      .select(col("interval_id"), col("s").cast("timestamp").as("start_ts"),
        col("e").cast("timestamp").as("end_ts"))
    val points = Seq(
      (10L, "2023-12-31 23:59:59"), // before -> out
      (11L, "2024-01-01 00:00:00"), // at start -> in
      (12L, "2024-01-01 00:59:59"), // inside -> in
      (13L, "2024-01-01 01:00:00")  // at end -> out
    ).toDF("point_id", "p")
      .select(col("point_id"), col("p").cast("timestamp").as("p_ts"))
    val got = RangeJoin
      .pointInInterval(intervals, points, "start_ts", "end_ts", "p_ts", 600)
      .select(col("point_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(11L, 12L))
  }

  test("intervalOverlap: exactly-once pairs == naive overlap, at adversarial widths") {
    import spark.implicits._
    def iv(rows: Seq[(Long, String, String)], p: String) =
      rows.toDF("id", "s", "e").select(col("id").as(s"${p}_id"),
        col("s").cast("timestamp").as(s"${p}_start"),
        col("e").cast("timestamp").as(s"${p}_end"))
    // shapes chosen to stress the dedup: long intervals spanning many
    // buckets (k-fold candidate duplication), touching-not-overlapping
    // (half-open: no pair), containment, identical intervals, and a
    // 1-second sliver crossing a bucket boundary
    val a = iv(Seq(
      (1L, "2024-01-01 00:00:00", "2024-01-01 12:00:00"),
      (2L, "2024-01-01 06:00:00", "2024-01-01 06:00:01"),
      (3L, "2024-01-02 00:00:00", "2024-01-03 00:00:00"),
      (4L, "2024-01-01 23:59:59", "2024-01-02 00:00:01")), "a")
    val b = iv(Seq(
      (10L, "2024-01-01 05:00:00", "2024-01-01 07:00:00"),
      (11L, "2024-01-01 12:00:00", "2024-01-01 13:00:00"), // touches a1: out
      (12L, "2024-01-01 00:00:00", "2024-01-01 12:00:00"), // identical to a1
      (13L, "2024-01-02 10:00:00", "2024-01-02 10:00:01")), "b")
    val naive = a.crossJoin(b)
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (w <- Seq(60L, 3600L, 86400L, 7L * 86400L)) {
      val binned = RangeJoin.intervalOverlap(a, b,
          "a_start", "a_end", "b_start", "b_end", w)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(binned == naive, s"bucketSeconds=$w: $binned vs $naive")
    }
  }

  test("intervalOverlap: empty intervals match nothing; shared column names resolve") {
    import spark.implicits._
    // both frames deliberately share the column names start/end — the
    // per-side __sbucket resolution must not throw ambiguous-reference
    def iv(rows: Seq[(Long, String, String)]) =
      rows.toDF("id", "s", "e").select(col("id"),
        col("s").cast("timestamp").as("start"),
        col("e").cast("timestamp").as("end"))
    val a = iv(Seq(
      (1L, "2024-01-01 00:30:00", "2024-01-01 00:30:00"), // empty, inside b10
      (2L, "2024-01-01 00:10:00", "2024-01-01 00:50:00"))) // real overlap
    val b = iv(Seq(
      (10L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
      (11L, "2024-01-01 02:00:00", "2024-01-01 02:00:00"))) // empty
    val got = RangeJoin.intervalOverlap(
        a.select(col("id").as("a_id"), col("start"), col("end")),
        b.select(col("id").as("b_id"), col("start"), col("end")),
        "start", "end", "start", "end", 600)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // the empty interval [00:30, 00:30) sits strictly inside b10 but
    // contains no point — it must NOT be emitted
    assert(got == Seq((2L, 10L)), got.toString)
  }

  test("intervalOverlap plans as an equi-join on the bucket key") {
    import spark.implicits._
    val a = Seq((1L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"))
      .toDF("a_id", "s", "e").select(col("a_id"),
        col("s").cast("timestamp").as("a_start"),
        col("e").cast("timestamp").as("a_end"))
    val b = Seq((2L, "2024-01-01 00:30:00", "2024-01-01 02:00:00"))
      .toDF("b_id", "s", "e").select(col("b_id"),
        col("s").cast("timestamp").as("b_start"),
        col("e").cast("timestamp").as("b_end"))
    val plan = RangeJoin.intervalOverlap(a, b,
        "a_start", "a_end", "b_start", "b_end", 600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
