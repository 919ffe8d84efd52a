package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** Exact cached size of a persisted Dataset, read from the session
  * CacheManager's accumulator — the number the Storage tab shows.
  *
  * Lives under `org.apache.spark.sql` because CacheManager /
  * CachedRDDBuilder are `private[sql]`; everything touched is public
  * Spark source API at the bytecode level (no reflection). Used by
  * [[graft.scale.MemoPool]] to enforce its byte cap with REAL sizes
  * instead of optimizer estimates: `sizeInBytesStats` is the
  * LongAccumulator the cached-batch writer bumps per batch, so it is
  * exact once materialized and 0 before — exactly the semantics a
  * cap wants (an unmaterialized memo holds no storage yet).
  */
object CachedBytes {

  /** (bytes, materialized): (0, false) when the frame is not in the
    * cache registry at all or its buffers were never computed. */
  def apply(df: Dataset[_]): (Long, Boolean) = df match {
    case ds: ClassicDataset[_] =>
      val cm = ds.sparkSession.sharedState.cacheManager
      cm.lookupCachedData(ds) match {
        case Some(cd) =>
          val b = cd.cachedRepresentation.cacheBuilder
          if (b.isCachedColumnBuffersLoaded)
            (b.sizeInBytesStats.value.longValue, true)
          else (0L, false)
        case None => (0L, false)
      }
    case _ => (0L, false)
  }
}
