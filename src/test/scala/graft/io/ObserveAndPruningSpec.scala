package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Two production-surface features a 100 TB deployment leans on:
  *
  *  - `Dataset.observe`: named metrics computed INSIDE the job (no
  *    second pass over the data) — the mechanism for row-count /
  *    quality counters on pipelines too big to re-scan for audit.
  *  - nested schema pruning: selecting one field of a struct column
  *    must prune the parquet read to that leaf — the difference
  *    between reading 2% and 100% of a wide-metadata corpus.
  */
class ObserveAndPruningSpec extends SparkSpec {

  test("observe computes audit metrics in-flight, no second scan") {
    val dir = sf("sf0.001")
    val observed = Tables(spark, dir, "orders")
      .observe("audit",
        count(lit(1)).as("rows"),
        sum(col("o_totalprice")).as("total"),
        count(when(col("o_totalprice") > 400000, 1)).as("big_orders"))
      .filter(col("o_orderstatus") === "O")
    // execute THIS plan instance (a derived .count() plan would carry
    // its own observe node and leave this one's metrics empty)
    val kept = observed.collect().length
    val metrics = observed.queryExecution.observedMetrics("audit")
    // metrics describe the PRE-filter stream at the observe point
    val rows = metrics.getAs[Long]("rows")
    assert(rows > kept, s"observe should see pre-filter rows ($rows vs $kept)")
    assert(metrics.getAs[Double]("total") > 0.0)
    assert(metrics.getAs[Long]("big_orders") >= 0L)
  }

  test("nested schema pruning reads only the selected struct leaf") {
    val d = Files.createTempDirectory("graft_nested").toString
    spark.range(100)
      .select(col("id"),
        struct(col("id").as("a"), (col("id") * 2).as("b"),
          lit("padpadpad").as("c")).as("meta"))
      .write.mode("overwrite").parquet(d)
    val q = spark.read.parquet(d).select(col("id"), col("meta.b"))
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("b"), s"selected leaf missing: $scan")
    assert(!scan.contains("padpadpad") && !scan.contains("\"c\"") &&
      !scan.matches(".*ReadSchema.*c:string.*"),
      s"unselected struct leaf still read: $scan")
    assert(q.collect().map(_.getLong(1)).sum == (0 until 100).map(_ * 2).sum)
  }
}
