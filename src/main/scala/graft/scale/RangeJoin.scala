package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (bucketed) interval-point range join.
  *
  * A pure range predicate (`p.ts BETWEEN i.start AND i.end`) has no
  * equi-key, so Catalyst can only plan it as a BroadcastNestedLoopJoin
  * or CartesianProduct — O(|intervals| x |points|) comparisons, the
  * classic range-join scale killer. The standard fix (Databricks'
  * binned range join, Flink/Trino interval joins do the same) is to
  * quantize time into fixed buckets: an interval registers in every
  * bucket it overlaps, a point in exactly one, the join becomes an
  * EQUI-join on the bucket id (hash-partitionable, AQE-skew-handled),
  * and the exact range predicate re-filters inside each bucket.
  *
  * Pair uniqueness needs no distinct: a point lives in exactly one
  * bucket, and an interval registers in that bucket at most once —
  * every true (interval, point) pair is produced exactly once.
  *
  * Cost model: replication factor = avg interval length / bucket size
  * + 1; candidate volume per bucket = intervals-in-bucket x
  * points-in-bucket. Pick bucketSeconds near the typical interval
  * length — shorter buckets replicate intervals more, longer buckets
  * admit more false candidates per bucket. Either way the work is
  * sharded by bucket across the cluster instead of a single
  * nested-loop stage.
  */
object RangeJoin {

  /** Join `points` to every interval containing them:
    * `start <= pts < end` (end-exclusive).
    *
    * @param bucketSeconds bucket width; choose ~ the typical interval
    *                      length (see cost model above)
    * @return inner-join of both inputs' columns, one row per
    *         (interval, contained point) pair
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
                      start: String, end: String, pts: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val b = bucketSeconds * 1000000L // micros
    val i2 = intervals.withColumn("__bucket",
      explode(expr(s"sequence(unix_micros($start) div $b, unix_micros($end) div $b)")))
    val p2 = points.withColumn("__bucket", expr(s"unix_micros($pts) div $b"))
    i2.join(p2,
        i2("__bucket") === p2("__bucket") &&
          p2(pts) >= i2(start) && p2(pts) < i2(end))
      .drop(i2("__bucket")).drop(p2("__bucket"))
  }
}
