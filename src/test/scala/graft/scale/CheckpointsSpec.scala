package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Checkpoints.free must actually remove a localCheckpoint's blocks
  * from the BlockManager (Dataset.unpersist does NOT — the blocks
  * belong to the RDD inside the LogicalRDD leaf), and the iterative
  * loops must not leak one frame per round (the round-7 OOM: a second
  * 100x scale-harness run died UNABLE_TO_ACQUIRE_MEMORY under
  * accumulated dead round frames). */
class CheckpointsSpec extends SparkSpec {

  private def persistentRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def awaitGone(ids: Set[Int]): Boolean = {
    // unpersist(blocking = false) is async — poll briefly
    val deadline = System.nanoTime() + 10_000_000_000L
    while (System.nanoTime() < deadline) {
      if (ids.intersect(persistentRddIds).isEmpty) return true
      Thread.sleep(50)
    }
    ids.intersect(persistentRddIds).isEmpty
  }

  test("free releases a localCheckpoint's blocks; values still readable before") {
    val before = persistentRddIds
    val df = spark.range(100).toDF("id").localCheckpoint()
    val added = persistentRddIds -- before
    assert(added.nonEmpty, "localCheckpoint registered no persistent RDD")
    assert(df.agg(sum(col("id"))).head().getLong(0) == 4950L)
    Checkpoints.free(df)
    assert(awaitGone(added), s"checkpoint blocks survived free(): $added")
  }

  test("free is a no-op on a non-checkpoint frame") {
    Checkpoints.free(spark.range(10).toDF("id")) // must not throw
  }

  test("free restores the lineage-warn logger level (suppression is " +
      "scoped, not JVM-wide)") {
    // before the r9 fix, one free() silenced MapPartitionsRDD to ERROR
    // forever — hiding the truncated-lineage WARN for live frames
    // anyone else unpersists by mistake (VERDICT r8 item 5)
    val name = "org.apache.spark.rdd.MapPartitionsRDD"
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    def explicitCfg = ctx.getConfiguration.getLoggerConfig(name).getName == name
    val before = org.apache.logging.log4j.LogManager.getLogger(name).getLevel
    val hadExplicit = explicitCfg
    Checkpoints.free(spark.range(50).toDF("id").localCheckpoint())
    val after = org.apache.logging.log4j.LogManager.getLogger(name).getLevel
    assert(after == before,
      s"free() left the $name logger at $after (was $before)")
    assert(after != org.apache.logging.log4j.Level.ERROR ||
      before == org.apache.logging.log4j.Level.ERROR,
      "logger must not remain silenced after free()")
    // inherited-level case: free() must not leave behind an explicit
    // LoggerConfig pinning the logger at a snapshot of the effective
    // level (it would detach the class from later setLogLevel calls)
    assert(explicitCfg == hadExplicit,
      "free() changed whether the logger has an explicit config")
  }

  test("a long CC run retains only O(1) checkpointed frames, not O(rounds)") {
    import spark.implicits._
    val before = persistentRddIds
    // 40-hop chain: ~40 min-label rounds, each with a checkpoint
    val edges = (1L to 40L).map(i => (i + 1, i)).toDF("src", "dst")
    val out = ConnectedComponents.run(edges)
    assert(out.count() == 41)
    val retained = (persistentRddIds -- before).size
    // the final labels frame (and transiently one predecessor) may
    // remain; 40 retained frames = the leak this spec exists to catch
    assert(retained <= 4,
      s"CC run leaked $retained checkpointed frames for ~40 rounds")
  }
}
