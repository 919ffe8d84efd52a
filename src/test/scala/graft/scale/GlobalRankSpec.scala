package graft.scale

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank must be bit-identical to the unpartitioned
  * row_number()/ntile() it replaces — the whole point is swapping the
  * single-partition WindowExec for a partitioned plan WITHOUT changing
  * one output row. Parity is checked against Spark's own global window
  * on real fixture data (with duplicate order values to exercise the
  * tie path) and on a crafted skewed input where most rows share one
  * value (all ties land in a single chunk by design).
  */
class GlobalRankSpec extends SparkSpec {

  private def orders = Tables(spark, sf("sf0.001"), "orders")
    .select(col("o_totalprice").as("v"), col("o_orderkey").as("k"))
    // fold prices onto a coarse grid so value ties actually occur
    .withColumn("v", round(col("v"), -3))

  test("withGlobalRank == unpartitioned row_number on tied fixture data") {
    val expected = orders
      .withColumn("r", row_number()
        .over(Window.orderBy(col("v"), col("k"))).cast("long"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("r")).toMap
    val got = GlobalRank
      .withGlobalRank(orders, col("v"), col("k"), "r", nChunks = 7)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("r")).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("withNtile == SQL ntile, including the N % n remainder buckets") {
    val expected = orders
      .withColumn("b", ntile(7)
        .over(Window.orderBy(col("v"), col("k"))).cast("long"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("b")).toMap
    val got = GlobalRank
      .withNtile(orders, col("v"), col("k"), "b", n = 7)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("b")).toMap
    assert(got == expected)
  }

  test("extreme skew: one value owning 90% of rows still ranks exactly") {
    val skewed = spark.range(1000).select(
      when(col("id") < 900, lit(42.0)).otherwise(col("id").cast("double"))
        .as("v"),
      col("id").as("k"))
    val expected = skewed
      .withColumn("r", row_number()
        .over(Window.orderBy(col("v"), col("k"))).cast("long"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("r")).toMap
    val got = GlobalRank
      .withGlobalRank(skewed, col("v"), col("k"), "r", nChunks = 8)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("r")).toMap
    assert(got == expected)
  }

  test("plan has no unpartitioned window and no single-partition exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val ranked = GlobalRank.withGlobalRank(orders, col("v"), col("k"), "r")
    def windows(p: SparkPlan): Seq[WindowExec] = p match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case q: QueryStageExec => windows(q.plan)
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    val ws = windows(ranked.queryExecution.executedPlan)
    assert(ws.nonEmpty, "rank window missing from the plan")
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "GlobalRank regressed to an unpartitioned window")
  }

  test("empty input yields an empty ranked frame, not a failure") {
    val empty = orders.where(lit(false))
    assert(GlobalRank.withGlobalRank(empty, col("v"), col("k"), "r")
      .count() == 0L)
  }
}
