package graft.io

import org.apache.spark.sql.SparkSession

/** Scale-ADAPTIVE partition sizing, applied by every harness session
  * (r15 optimization round, guide §2.2 "let AQE coalesce" — partition
  * counts must derive from DATA SIZE, not from the local core count).
  *
  * Two Spark defaults pin tiny shuffles at ~defaultParallelism
  * partitions:
  *
  *  - `coalescePartitions.parallelismFirst` (default true) makes AQE
  *    ignore the advisory partition size and keep ~core-count
  *    reducers even for KB-sized exchanges (Spark's own config doc
  *    recommends false);
  *  - `canChangeCachedPlanOutputPartitioning` (default false)
  *    disables AQE coalescing inside persist() materialization, so
  *    every memoized base cached at 32 partitions and EVERY per-round
  *    cache scan of the iterative operators launched 32 tasks on
  *    KB-sized frames.
  *
  * Measured (sf0.1, local[32], iterative-graph subset, back-to-back):
  * defaults 39.8 s → these two flags 28.6 s (−28%), matching a
  * shuffle.partitions=8 run (28.3 s) WITHOUT shrinking the session
  * constant — large shuffles keep full width (64 MB advisory), so the
  * same setting is right at 100 TB, where every one of these
  * exchanges is GBs and never coalesces below the cluster's
  * parallelism.
  */
object Sessions {
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
}
