package graft.io

import org.apache.spark.sql.SparkSession

/** Scale-ADAPTIVE partition sizing, applied by every harness session
  * (r15 optimization round, guide §2.2 "let AQE coalesce" — partition
  * counts must derive from DATA SIZE, not from the local core count).
  *
  * ONE default changes: `canChangeCachedPlanOutputPartitioning=true`.
  * Its false default disables AQE partition coalescing inside
  * `persist()` materialization, so every memoized base cached at the
  * full session shuffle width and EVERY per-round cache scan of the
  * iterative operators (rank/BFS/CC loops read their cached edge and
  * label frames ~15×/query) launched 32 tasks on KB-sized frames.
  * With the flag on, the cache materializes at AQE's
  * parallelism-first target — never fewer than bytes/minPartitionSize
  * (1 MB) partitions, capped by the cluster's parallelism — which is
  * data-proportional at every tier.
  *
  * Measured, mixed iterative+dedup subset, back-to-back per tier:
  *
  * | config | sf0.1 (local[32]) | sf1 |
  * |---|---|---|
  * | Spark defaults | 60.5 s | 161.0 s |
  * | + canChangeCachedPlanOutputPartitioning=true | 51.6 s | **153.2 s** |
  * | + also parallelismFirst=false (REJECTED) | 51.1 s | 217.1 s |
  *
  * The rejected row is the honest part: `parallelismFirst=false`
  * (which Spark's config doc suggests) matches the win at sf0.1 but
  * CRATERS at sf1 (a10_copurchase 10.9→36.7 s, d_simhash 6.7→20.6 s)
  * because pure byte-based 64 MB reducer targets under-parallelize
  * CPU-heavy object aggregations (collect_set basket build, signature
  * hashing) exactly in the mid-scale band a real cluster also has —
  * the local-only-tuning trap. parallelism-first coalescing stays at
  * the Spark default; the env knobs below keep both measurable.
  */
object Sessions {
  def tuned(b: SparkSession.Builder): SparkSession.Builder = {
    val pf = sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true")
    val ccp = sys.env.getOrElse("SPARK_GRAFT_CACHED_COALESCE", "true")
    // AQE's runtime SMJ->SHJ rewrite (guide §3.1): fires only when
    // EVERY post-shuffle partition of the build side is under the
    // threshold — decided from the shuffle's ACTUAL map output sizes,
    // so at larger tiers big joins simply stop converting (no blanket
    // preferSortMergeJoin=false, whose per-partition OOM hazard the
    // guide warns about). MEASURED AND REJECTED as a default (r15):
    // 64m over the 14 SMJ-carrying rows, 3-rep minima back-to-back —
    // 23.46 s (off) vs 23.34 s (on), every per-row delta within
    // ±0.19 s noise. The bench's SMJ sorts ride KB-sized frames where
    // the sort is already cheap; the knob stays for cluster-tier
    // measurement. 0 = Spark default (off).
    val shj = sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "0")
    b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        ccp)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", shj)
  }
}
