package graft.scale

/** Thread-scoped ledger of persisted intermediates for the fixed
  * query-harness contract.
  *
  * The iterative graph operators pin intermediates and return handles
  * ([[PageRank.runTracked]]) for the caller to release once its action
  * has run. Direct callers use that contract. `SparkEntry.queries`
  * CANNOT: its signature is fixed at `(SparkSession, String) =>
  * DataFrame`, so handles have no way to ride the return value — and
  * round 4 showed the consequence: Bench/Verify are ONE long-lived
  * session running 160 queries, and the graph queries' unreleased pins
  * (BFS frontiers, oriented edge lists, the sssp pair base)
  * accumulated until LRU pressure cleared them, evicting caches other
  * queries were still using.
  *
  * Query builders deposit handles here; each harness drains AFTER its
  * action (Bench after `count()`, Verify after the parquet write, specs
  * after collect). Thread-local on purpose: Verify runs queries
  * concurrently on a pool, and a session-global drain from one thread
  * would unpersist frames a query on another thread is mid-computing —
  * correct (Spark recomputes) but a silent perf cliff. Builder and
  * action always share a thread in every harness, so thread scope is
  * exactly query scope. Drain is a no-op for never-computed persist
  * marks (plan-only walks like PlanShapeSpec).
  */
object CacheRegistry {
  private val local = new ThreadLocal[List[PageRank.CacheHandles]] {
    override def initialValue(): List[PageRank.CacheHandles] = Nil
  }

  /** Record handles for release at the next same-thread [[drain]]. */
  def track(h: PageRank.CacheHandles): Unit = local.set(h :: local.get())

  /** Record bare persisted frames (sugar for a single-frame handle). */
  def track(dfs: org.apache.spark.sql.DataFrame*): Unit =
    track(new PageRank.CacheHandles(dfs.toSeq))

  /** Record localCheckpoint'ed frames — released via Checkpoints.free
    * (Dataset.unpersist cannot reach a LogicalRDD leaf's blocks). */
  def trackCheckpointed(dfs: org.apache.spark.sql.DataFrame*): Unit =
    track(new PageRank.CheckpointHandles(dfs.toSeq))

  /** Release everything tracked on THIS thread since the last drain;
    * returns the handle count (0 = nothing pinned, the common case). */
  def drain(): Int = {
    val hs = local.get()
    local.set(Nil)
    hs.foreach(_.release())
    hs.size
  }
}
