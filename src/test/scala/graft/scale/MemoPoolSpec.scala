package graft.scale

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** The byte cap of the session-lifetime memo pool must really evict
  * (VERDICT r14 item 2): before the pool, the memo bases were
  * MEMORY_AND_DISK frames that nothing ever unpersisted — memory
  * pressure only moved them to disk, where blocks are NOT
  * LRU-reclaimed, so a long session accumulated every family's base
  * on disk without bound. */
class MemoPoolSpec extends SparkSpec {

  private def entry(name: String, rows: Long) =
    MemoPool.getOrBuild(spark, "memo_pool_spec", name) {
      spark.range(rows).selectExpr("id", "id * 2 AS v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }(Seq(_))

  test("over-cap builds evict the least-recently-used entry") {
    MemoPool.clear(spark)
    MemoPool.capOverrideBytes = Some(64L * 1024) // 64 KB — tiny
    try {
      // NOTE: distinct row counts — Spark's CacheManager keys cached
      // data by PLAN EQUALITY, so two identical plans would share one
      // cache entry and the eviction arithmetic would alias
      val a = entry("spec_a", 100000L)
      a.count() // materialize: ~1.6 MB cached, already over the cap
      assert(MemoPool.pooledBytes(spark) > 64L * 1024)
      val b = entry("spec_b", 120000L)
      b.count() // materializing b makes a the LRU victim...
      entry("spec_b", 120000L) // ...on the next pool access
      assert(!MemoPool.pooledNames(spark).contains("spec_a"),
        "LRU entry survived an over-cap access")
      assert(a.storageLevel == StorageLevel.NONE,
        "evicted entry's frame was not unpersisted")
      // an evicted entry transparently rebuilds on next use
      val a2 = entry("spec_a", 100000L)
      assert(a2.count() === 100000L)
    } finally {
      MemoPool.capOverrideBytes = None
      MemoPool.clear(spark)
    }
  }

  test("under-cap entries stay memoized (same instance back)") {
    MemoPool.clear(spark)
    try {
      val a = entry("spec_stable", 10L)
      a.count()
      assert(entry("spec_stable", 10L) eq a)
      assert(MemoPool.pooledNames(spark).contains("spec_stable"))
    } finally MemoPool.clear(spark)
  }

  test("clear unpersists and forgets") {
    val a = entry("spec_clear", 10L)
    a.count()
    MemoPool.clear(spark)
    assert(!MemoPool.pooledNames(spark).contains("spec_clear"))
    assert(a.storageLevel == StorageLevel.NONE)
  }
}
