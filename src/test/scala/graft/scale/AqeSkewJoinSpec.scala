package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proof that AQE's skew-join handling actually engages on a skewed
  * shuffle join — the runtime complement to scale/SkewJoin (the
  * manual salted fallback for when AQE cannot help, e.g. broadcast-
  * ineligible aggregations). Thresholds are lowered so the fixture's
  * skew crosses AQE's detection bar; on the cluster the defaults
  * (256 MB partitions) play the same role. */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed partition in a sort-merge join") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // detect skew at tiny sizes so the fixture triggers it
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._

    // 100k rows on ONE hot key + a sprinkle of others vs a small dim
    val fact = s.range(100000).select(
      when($"id" % 100 === 0, $"id" % 7).otherwise(lit(3L)).as("k"),
      concat(lit("pad-pad-pad-pad-pad-"), $"id").as("payload"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "hot"),
      (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "v")

    val joined = fact.join(dim, "k")
    // execute THIS plan instance (count() would run a derived plan and
    // leave this one's adaptive plan unfinalized)
    val n = joined.collect().length
    assert(n == 100000)

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(plan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n$plan")
  }
}
