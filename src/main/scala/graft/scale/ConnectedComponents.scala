package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge list — the completion
  * step of every fuzzy-dedup pipeline: near-dup PAIRS (MinHash/SimHash
  * verified) become dup CLUSTERS, and each cluster keeps one
  * representative (min doc_id). The reference has no graph operators at
  * all; this is part of the training-data-pipeline extension surface.
  *
  * Algorithm: iterative min-label propagation on DataFrames.
  *   labels(v) <- min(labels(v), min over neighbors u of labels(u))
  * repeated to fixpoint. Each round is one shuffle-on-node-id hash agg
  * (map-side combinable `min`); rounds = graph DIAMETER. Near-dup
  * graphs are dense clique-ish clusters with tiny diameters (a doc is a
  * near-dup of most other docs in its cluster), so propagation
  * converges in a handful of rounds — this is why label propagation,
  * not the O(log n)-round alternating large-star/small-star algorithm
  * (Kiveris et al., "Connected Components in MapReduce and Beyond"), is
  * the right default for dedup. For adversarial diameters (long chains)
  * swap the loop body for the star operations; the driver loop and
  * convergence test stay identical.
  *
  * Scale mechanics:
  *  - state per round is one (node, label) row per vertex — 16 bytes;
  *    the edge list is persisted once and re-joined each round;
  *  - `localCheckpoint` truncates the lineage each round (an iterative
  *    plan otherwise grows by one join+agg per round and re-executes
  *    from the scan); on a real cluster with executor loss, use
  *    `checkpoint` against a reliable store instead;
  *  - convergence is detected by the sum of labels: labels only ever
  *    decrease, so the sum is strictly monotone until fixpoint — one
  *    cheap driver-side scalar per round, no expensive set compare.
  */
object ConnectedComponents {

  /** @param edges undirected edge list, either orientation, integral
    *              node ids in columns `src`/`dst` (self-loops and
    *              duplicate edges are fine)
    * @return (node, component) — component = min node id reachable;
    *         every node incident to an edge appears exactly once
    */
  def run(edges: DataFrame, src: String = "src", dst: String = "dst",
          maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst"))
    // symmetrize once; propagation then only needs one join direction
    val sym = e.union(e.select(col("dst"), col("src")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // seed with min(node, min neighbor) — same one-shuffle cost as a
    // plain distinct-node init, but already one propagation step ahead
    // (saves a full join+agg round on shallow dup-cluster graphs).
    // The convergence checksum rides each round's ONE action as an
    // observe() metric — the eager localCheckpoint fires the
    // observation listener, so no separate per-round checksum job.
    val (labels0, sum0) = checkpointWithSum(
      sym.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src").as("node"),
          least(col("src"), col("mn")).as("component")))
    var labels = labels0
    var prevSum = sum0
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("node"))
        .select(sym("dst").as("node"), col("component"))
      val (next, s) = checkpointWithSum(
        labels.unionByName(prop)
          .groupBy(col("node"))
          .agg(min(col("component")).as("component")))
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }

  // Monotone-label checksum, collected DURING the checkpoint
  // materialization (labels only decrease, so the sum is strictly
  // monotone until fixpoint — one scalar, no set compare, no extra job)
  private var obsId = new java.util.concurrent.atomic.AtomicLong(0L)
  private def checkpointWithSum(df: DataFrame): (DataFrame, Long) = {
    val obs = new org.apache.spark.sql.Observation(
      s"cc_round_${obsId.incrementAndGet()}")
    val out = df.observe(obs, sum(col("component")).as("cs"))
      .localCheckpoint() // eager: materializes + truncates lineage
    (out, obs.get("cs").asInstanceOf[Long])
  }
}
