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

  test("xml source/sink (built-in since Spark 4) round-trips losslessly") {
    val base = java.nio.file.Files.createTempDirectory("graft_xml").toString
    val expected = normalize(sample)
    sample.write.mode("overwrite").option("rowTag", "order")
      .format("xml").save(s"$base/xml")
    // XML is schemaless on read — infer, then cast back
    val back = spark.read.option("rowTag", "order").format("xml")
      .load(s"$base/xml")
    assert(normalize(back) == expected, "xml round-trip differs")
  }

  test("binaryFile source: raw-file ingestion for multimodal payloads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toString
    val payloads = Map("a.jpg" -> Array[Byte](1, 2, 3),
      "b.jpg" -> Array[Byte](9, 8, 7, 6))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"), bytes)
    }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.jpg").load(dir)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val back = df.collect().map(r =>
      r.getString(0).split('/').last -> r.getAs[Array[Byte]]("content")).toMap
    assert(back.keySet == payloads.keySet)
    payloads.foreach { case (k, v) => assert(back(k).toSeq == v.toSeq) }
  }

  test("persist: reused branch reads from InMemoryTableScan") {
    val df = sample.filter(col("price") > 100000.0).persist()
    try {
      df.count() // materialize
      val again = df.groupBy(col("o_orderpriority")).count()
      val plan = again.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"expected cached scan in:\n$plan")
      assert(again.count() > 0)
    } finally { df.unpersist(); () }
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

  test("dynamic partition pruning engages on a dim-filtered star join") {
    // The 100 TB star-join mechanism static pruning can't reach: the
    // fact-side partition filter only EXISTS at runtime, derived from
    // the dim side's filtered keys (reusing its broadcast). Without
    // DPP the partitioned fact table is scanned in full for every
    // dim-filtered query — the single biggest scan-cost cliff on a
    // date-partitioned warehouse.
    val base = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    sample.withColumn("y", year(col("d")))
      .write.mode("overwrite").partitionBy("y").parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    // dim: one row per year, filter selects a single year by a
    // NON-partition attribute (so static pruning cannot fire)
    val dim = fact.select(col("y")).distinct()
      .withColumn("tag", concat(lit("year-"), col("y")))
    val joined = fact.join(dim.filter(col("tag") === "year-1995"), Seq("y"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning subquery in fact scan:\n$plan")
    val expected = sample.filter(year(col("d")) === 1995).count()
    assert(joined.count() == expected)
  }
}
