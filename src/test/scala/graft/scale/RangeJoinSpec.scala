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
}
