package graft.plans

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("as-of join == lag-window formulation on the events table") {
    val dir = sf("sf0.001")
    val l = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = Tables.events(spark, dir)
      .select(col("event_id").as("prior_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"))
    val viaAsOf = AsOf.join(spark, l, r,
      l("user_id"), r("r_user"), l("ts"), r("r_ts"))
      .select(col("event_id"), col("prior_id"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val viaLag = Tables.events(spark, dir)
      .select(col("event_id"), lag(col("event_id"), 1).over(w).as("prior_id"))
      .filter(col("prior_id").isNotNull)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

    assert(viaAsOf.nonEmpty)
    assert(viaAsOf == viaLag)
  }

  test("custom exec appears in the physical plan (strategy fired)") {
    val dir = sf("sf0.001")
    val l = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts"))
    val r = Tables.events(spark, dir)
      .select(col("event_id").as("p"), col("user_id").as("ru"), col("ts").as("rt"))
    val df = AsOf.join(spark, l, r, l("user_id"), r("ru"), l("ts"), r("rt"))
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("edge cases: empty right partner set, interleaved keys") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val l = Seq((1L, 10L, ts(5)), (2L, 10L, ts(10)), (3L, 20L, ts(1)))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((100L, 10L, ts(4)), (101L, 10L, ts(9)), (102L, 30L, ts(0)))
      .toDF("prior_id", "r_user", "r_ts")
    val out = AsOf.join(spark, l, r, l("user_id"), r("r_user"), l("ts"), r("r_ts"))
      .select(col("event_id"), col("prior_id"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // event 3 (user 20) has no partner -> dropped; events 1,2 take the
    // latest strictly-earlier right row
    assert(out == Map(1L -> 100L, 2L -> 101L))
  }
}
