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

  test("forward direction == lead-window formulation on the events table") {
    val dir = sf("sf0.001")
    val l = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = Tables.events(spark, dir)
      .select(col("event_id").as("next_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"))
    val viaAsOf = AsOf.join(spark, l, r,
      l("user_id"), r("r_user"), l("ts"), r("r_ts"), forward = true)
      .select(col("event_id"), col("next_id"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val viaLead = Tables.events(spark, dir)
      .select(col("event_id"), lead(col("event_id"), 1).over(w).as("next_id"))
      .filter(col("next_id").isNotNull)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

    assert(viaAsOf.nonEmpty)
    assert(viaAsOf == viaLead)
  }

  test("forward direction: strictly-after semantics, no partner dropped") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val l = Seq((1L, 10L, ts(5)), (2L, 10L, ts(9)), (3L, 20L, ts(1)))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((100L, 10L, ts(5)), (101L, 10L, ts(9)), (102L, 20L, ts(0)))
      .toDF("next_id", "r_user", "r_ts")
    val out = AsOf.join(spark, l, r, l("user_id"), r("r_user"),
      l("ts"), r("r_ts"), forward = true)
      .select(col("event_id"), col("next_id"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // 1 @05 -> 101 @09 (equal ts 100 @05 excluded: STRICTLY after);
    // 2 @09 has no later partner; 3 @01 has only an earlier one
    assert(out == Map(1L -> 101L))
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

  test("null timestamps/keys are dropped, not matched as epoch zero") {
    import spark.implicits._
    def ts(m: Int) = Option(java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"))
    val l = Seq((1L, Option(10L), ts(5)), (2L, Option(10L), None),
      (3L, None: Option[Long], ts(7)))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((100L, Option(10L), ts(4)), (101L, Option(10L), None),
      (102L, None: Option[Long], ts(1)))
      .toDF("prior_id", "r_user", "r_ts")
    val out = AsOf.join(spark, l, r, l("user_id"), r("r_user"), l("ts"), r("r_ts"))
      .select(col("event_id"), col("prior_id"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // left rows 2 (null ts) and 3 (null key) are dropped; right rows
    // 101/102 (null ts/key) are never candidates — only 1 -> 100 remains
    assert(out == Map(1L -> 100L))
  }

  test("integer keys and date timestamps are supported (widened to long)") {
    import spark.implicits._
    def d(day: Int) = Option(java.sql.Date.valueOf(f"2024-01-$day%02d"))
    val l = Seq((1L, 10, d(5)), (2L, 20, d(3))).toDF("event_id", "user_id", "ts")
    val r = Seq((100L, 10, d(4)), (101L, 20, d(1))).toDF("prior_id", "r_user", "r_ts")
    val out = AsOf.join(spark, l, r, l("user_id"), r("r_user"), l("ts"), r("r_ts"))
      .select(col("event_id"), col("prior_id"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out == Map(1L -> 100L, 2L -> 101L))
  }

  test("string key is rejected with a clear error") {
    import spark.implicits._
    val l = Seq(("u1", 1L)).toDF("k", "ts")
    val r = Seq(("u1", 0L)).toDF("rk", "rts")
    val err = intercept[IllegalArgumentException] {
      AsOf.join(spark, l, r, l("k"), r("rk"), l("ts"), r("rts"))
    }
    assert(err.getMessage.contains("integral"))
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

  test("tolerance bounds the match gap inclusively, both directions") {
    import spark.implicits._
    // integral "timestamps" so tolerance units are raw and exact
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 300L))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((90L, 10L, 95L), (91L, 10L, 170L), (92L, 10L, 330L))
      .toDF("prior_id", "r_user", "r_ts")
    def backward(tol: Long) =
      AsOf.join(spark, l, r, l("user_id"), r("r_user"), l("ts"), r("r_ts"),
        tolerance = tol)
        .select(col("event_id"), col("prior_id"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // unbounded: every left row matches its nearest earlier right row
    assert(backward(Long.MaxValue) == Map(1L -> 90L, 2L -> 91L, 3L -> 92L)
      .updated(3L, 91L)) // 330 is later than 300; nearest earlier is 170
    // gap for event 1 is 5, event 2 is 30, event 3 is 130
    assert(backward(130L) == Map(1L -> 90L, 2L -> 91L, 3L -> 91L))
    assert(backward(129L) == Map(1L -> 90L, 2L -> 91L)) // inclusive bound
    assert(backward(5L) == Map(1L -> 90L))
    assert(backward(4L) == Map.empty[Long, Long])

    def forward(tol: Long) =
      AsOf.join(spark, l, r, l("user_id"), r("r_user"), l("ts"), r("r_ts"),
        forward = true, tolerance = tol)
        .select(col("event_id"), col("prior_id"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // next-after gaps: event 1 -> 170 (70), event 2 -> 330 (130),
    // event 3 -> 330 (30)
    assert(forward(Long.MaxValue) == Map(1L -> 91L, 2L -> 92L, 3L -> 92L))
    assert(forward(70L) == Map(1L -> 91L, 3L -> 92L))
    assert(forward(29L) == Map.empty[Long, Long])
  }

  test("tolerance matches the join+window formulation on real events") {
    val dir = sf("sf0.001")
    val tolUs = 30L * 60 * 1000000
    val l = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = Tables.events(spark, dir)
      .select(col("event_id").as("prior_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"))
    val viaAsOf = AsOf.join(spark, l, r,
      l("user_id"), r("r_user"), l("ts"), r("r_ts"), tolerance = tolUs)
      .select(col("event_id"), col("prior_id"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // reference: unbounded lag-window, then filter the gap
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val viaLag = Tables.events(spark, dir)
      .select(col("event_id"),
        lag(col("event_id"), 1).over(w).as("prior_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .as("gap_us"))
      .filter(col("prior_id").isNotNull && col("gap_us") <= tolUs)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(viaAsOf.nonEmpty && viaAsOf.size < // the bound must bite
      AsOf.join(spark, l, r, l("user_id"), r("r_user"), l("ts"), r("r_ts"))
        .count())
    assert(viaAsOf == viaLag)
  }
}
