package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark 4 runtime filters): a
  * selective filter on one join side injects a bloom-filter probe into
  * the OTHER side's scan, discarding non-joinable rows before the
  * shuffle — at 100 TB this is the difference between shuffling the
  * full fact table and shuffling only the ~matching fraction.
  * Thresholds are lowered so the fixture crosses the size bars; the
  * cluster defaults (10 MB creation side) play the same role. */
class BloomFilterJoinSpec extends SparkSpec {

  test("selective dim filter injects a bloom probe into the fact scan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep the shuffle join
    import s.implicits._

    val dir = sf("sf0.01")
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val ord = s.read.parquet(s"$dir/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT") // selective build side
    val joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
      s"no runtime bloom filter injected:\n$plan")
    val rows = joined.collect()
    assert(rows.length == 1 && rows.head.getLong(1) > 0)
  }
}
