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

  /** Interval-INTERVAL overlap join: one row per (a, b) pair whose
    * half-open intervals [aStart, aEnd) and [bStart, bEnd) intersect.
    *
    * Same binning idea as `pointInInterval`, plus the exactly-once
    * trick the two-sided case needs: a pair sharing k buckets would be
    * emitted k times, so the join keeps a pair ONLY in the bucket
    * containing the overlap's start, max(aStart, bStart) — a point
    * inside both intervals, hence a bucket both sides registered, and
    * unique per pair. No distinct, no post-dedup shuffle; the exact
    * overlap predicate (aStart < bEnd AND bStart < aEnd) re-filters
    * inside the bucket as before. Both interval sets replicate by
    * length/bucketSeconds + 1, and the candidate work is sharded by
    * bucket — never a nested-loop stage over the full cross product.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = bucketSeconds * 1000000L // micros
    // half-open: the last occupied bucket is (end - 1) div w. Empty
    // intervals (end <= start) contain no point, so they are filtered
    // out here — ENFORCING the half-open precondition rather than
    // documenting it (an unfiltered [x,x) would both explode a
    // boundary-crossing descending sequence and spuriously match as
    // the point x). `__sbucket` is the interval-start's bucket,
    // resolved per-side BEFORE the join so callers may share column
    // names across a and b without ambiguous-reference errors.
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(expr(s"unix_micros($e) > unix_micros($s)"))
        .withColumn("__sbucket", expr(s"unix_micros($s) div $w"))
        .withColumn("__bucket", explode(expr(
          s"sequence(unix_micros($s) div $w, (unix_micros($e) - 1) div $w)")))
    val a2 = binned(a, aStart, aEnd)
    val b2 = binned(b, bStart, bEnd)
    // exactly-once bucket = bucket of max(aStart, bStart); div by a
    // positive width is monotonic, so greatest() commutes with it and
    // the per-side __sbucket columns suffice — no cross-plan expr().
    a2.join(b2,
        a2("__bucket") === b2("__bucket") &&
          a2(aStart) < b2(bEnd) && b2(bStart) < a2(aEnd) &&
          greatest(a2("__sbucket"), b2("__sbucket")) === a2("__bucket"))
      .drop(a2("__bucket")).drop(b2("__bucket"))
      .drop(a2("__sbucket")).drop(b2("__sbucket"))
  }
}
