package graft.scale

import org.apache.spark.sql.DataFrame

/** Release the cached blocks behind a `localCheckpoint`ed DataFrame.
  *
  * Every iterative operator here (ConnectedComponents, PageRank, Bfs,
  * KCore) truncates lineage per round with an eager
  * `localCheckpoint` — but the checkpoint's blocks belong to the RDD
  * wrapped inside the resulting plan's `LogicalRDD` leaf, which
  * `Dataset.unpersist()` (a CacheManager call) never reaches. Without
  * an explicit release every ROUND of every iterative query leaks its
  * full state frame into the BlockManager for the session's lifetime;
  * a long harness session (Bench/Verify run 210 queries; the scale
  * harness runs 100x corpora) accumulates gigabytes of dead blocks and
  * eventually starves execution memory (observed round 7: the second
  * 100x g_pagerank run died UNABLE_TO_ACQUIRE_MEMORY after three CC
  * modes' round frames piled up).
  *
  * Contract: call on round N-1's frame only AFTER round N's checkpoint
  * has materialized (eager=true does) — the new checkpoint owns its
  * own blocks, so the parent's are dead by then. The FINAL frame of a
  * loop is the caller's result and must stay alive.
  */
object Checkpoints {

  // Unpersisting a locally-checkpointed RDD logs a per-RDD WARN
  // ("lineage has been truncated and cannot be recomputed") — a real
  // hazard for live frames, pure noise under this object's
  // dead-frames-only contract. Silence that one logger once.
  private lazy val quietLineageWarn: Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)

  def free(df: DataFrame): Unit = df.queryExecution.logical match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      quietLineageWarn
      l.rdd.unpersist(blocking = false)
    case _ => () // not a checkpoint leaf — nothing to free
  }
}
