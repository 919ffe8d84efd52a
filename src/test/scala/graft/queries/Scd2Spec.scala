package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts of the SCD-2 history build (j11_scd2) on a
  * planted fixture — the oracle pins exact fixture values; this pins
  * the island/interval semantics on edge shapes the fixture lacks:
  * same-timestamp ties, all-same-type users, single-event users. */
class Scd2Spec extends SparkSpec {

  private def runOn(events: Seq[(Long, java.sql.Timestamp, Long, String)])
  : List[(Long, String, Long, Option[Long], Long, Boolean)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd2_fix").toString
    events.toDF("event_id", "ts", "user_id", "event_type")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    RelationalPack.queries("j11_scd2")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4), r.getBoolean(5))).toList
  }

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("consecutive same-type events collapse into one version") {
    val out = runOn(Seq(
      (1L, ts(1000), 7L, "view"), (2L, ts(2000), 7L, "view"),
      (3L, ts(3000), 7L, "click"), (4L, ts(4000), 7L, "view")))
    assert(out.map(_._2) == List("view", "click", "view"))
    assert(out.map(_._5) == List(1L, 2L, 3L))
    // interval chain: each version closes exactly where the next opens
    assert(out(0)._4.contains(out(1)._3) && out(1)._4.contains(out(2)._3))
    // only the last version is current/open
    assert(out.map(_._6) == List(false, false, true))
  }

  test("single-event user: one open current version") {
    val out = runOn(Seq((1L, ts(5000), 3L, "signup")))
    assert(out == List((3L, "signup", 5000000L, None, 1L, true)))
  }

  test("same-timestamp ties break by event_id, deterministically") {
    val out = runOn(Seq(
      (9L, ts(1000), 5L, "b"), (2L, ts(1000), 5L, "a")))
    // event_id 2 sorts first -> 'a' is version 1, 'b' current
    assert(out.map(t => (t._2, t._5, t._6)) ==
      List(("a", 1L, false), ("b", 2L, true)))
  }

  test("users never interleave: versions are per-entity") {
    val out = runOn(Seq(
      (1L, ts(1000), 1L, "x"), (2L, ts(2000), 2L, "y"),
      (3L, ts(3000), 1L, "z")))
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._2) == List("x", "z") && u1.map(_._5) == List(1L, 2L))
    assert(out.filter(_._1 == 2L).head._6)
  }
}
