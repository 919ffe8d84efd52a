package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ly_partitioned_roundtrip's gate row proves VALUE fidelity through
  * the hive-partitioned write→read cycle; this spec pins the LAYOUT
  * properties: the partition column lives in directory names (not in
  * the data files) and a partition-column filter prunes the scan to
  * the matching directories — the read-budget guarantee partitioning
  * exists to buy.
  */
class PartitionedRoundtripSpec extends SparkSpec {

  private lazy val dir =
    LayoutPack.partitionedCopyOfEvents(spark, sf("sf0.001"))

  test("partition directories exist per event_type") {
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).toSet
    assert(parts.size >= 3, s"expected one dir per type, got $parts")
  }

  test("filtered read-back prunes to the matching partitions") {
    val filtered = spark.read.parquet(dir)
      .filter(col("event_type").isin("click", "view"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type#"),
      s"partition filter not pushed to directory pruning:\n$plan")
  }

  test("round-trip loses nothing, partition column reconstructed") {
    val orig = graft.io.Tables.events(spark, sf("sf0.001"))
    val back = spark.read.parquet(dir)
    assert(back.count() === orig.count())
    // partition column is re-derived from directory names: same values
    val a = back.groupBy(col("event_type")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = orig.groupBy(col("event_type")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a === b)
  }
}
