package graft.queries

import graft.QueryPack
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (builder brief). Brute-force cosine top-k is the
  * correctness baseline (oracle-checked); the sign-LSH bucketed variant
  * is the 100 TB scale path (recall-tested against brute force in
  * ScalaTest, rows-only in the t2 gate since its output is
  * hash-dependent).
  *
  * Dot products are spelled as an explicit left-to-right fold over
  * doubles (`aggregate(zip_with(...))`) so both Spark and the DuckDB
  * oracle evaluate the identical IEEE operation sequence — bit-exact
  * cosines, no rank flapping near ties.
  *
  * Scale notes: the query set is broadcast (it is the small side by
  * construction); norms are computed once per corpus vector in the
  * scan projection, not per pair; top-k per query is a partial
  * per-partition top-k under AQE before the final window — no global
  * sort of the pair space.
  */
object SimilarityPack extends QueryPack {

  /** Dot product via the codegen'd DotProduct expression: identical
    * left-to-right IEEE order to the oracle's list_dot_product (bit-
    * exact) and ~5x faster than the interpreted higher-order fold on
    * the all-pairs join. (A 64-term unrolled Add chain was measured
    * too: it trips codegen fallback and is 4x SLOWER than the fold.) */
  private[queries] def dotCols(a: String, b: String): Column =
    graft.expr.DotProduct(col(a), col(b))

  /** Memoized + persisted per (session, sfDir) since the r14
    * optimization round: ~10 similarity rows derive query and corpus
    * sides from this projection, and un-persisted each derivation
    * re-ran the embeddings scan + double-cast + norm per use. Narrow
    * (≈ vec dims × 8 B per row), session-lifetime like the other memo
    * bases (byte-capped MemoPool since r15; dead-session entries
    * purged). */
  private[queries] def vecs(s: SparkSession, dir: String): DataFrame =
    graft.scale.MemoPool.getOrBuild(s, dir, "vecs") {
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", sqrt(dotCols("v", "v")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }(Seq(_))

  private val dot = dotCols("qv", "v")

  /** lcm(61..70): the common denominator that makes reciprocal-rank
    * fusion INTEGER-exact. RRF(k=60) sums 1/(60+rank) over rankers
    * with rank in 1..10, so every term times this scale is an exact
    * int64 (max total 2 * L/61 ~ 4.7e12) — both engines order fused
    * candidates on identical integers, no float summation order, no
    * rank flapping at the hash. */
  private[queries] val RrfScale = 142813628717760L

  /** Reciprocal-rank fusion (k=60) of two rankers given per-pair
    * scores (qid, nid, cos, ip): rank each signal with deterministic
    * nid tie-break, keep the union of the two top-10 lists, score by
    * the scaled-integer RRF sum (a ranker outside its top-10
    * contributes 0 — standard RRF truncation), emit fused top-10.
    * Three windows over ONE qid partitioning — a single exchange. */
  private[queries] def rrfFuse(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wa = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    val wb = Window.partitionBy(col("qid"))
      .orderBy(col("ip").desc, col("nid").asc)
    val wf = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_scaled").desc, col("nid").asc)
    pairs
      .withColumn("ra", row_number().over(wa))
      .withColumn("rb", row_number().over(wb))
      .filter(col("ra") <= 10 || col("rb") <= 10)
      .withColumn("rrf_scaled",
        when(col("ra") <= 10, expr(s"$RrfScale div (60 + ra)"))
          .otherwise(lit(0L)) +
        when(col("rb") <= 10, expr(s"$RrfScale div (60 + rb)"))
          .otherwise(lit(0L)))
      .withColumn("rk", row_number().over(wf))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("nid"), col("rrf_scaled"), col("rk"))
      .orderBy(col("qid"), col("rk"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-10 for 10 query vectors: broadcast the
    // queries against the corpus, rank per query with deterministic
    // tie-break. Linear in corpus size per query — the exact baseline.
    "s_knn_brute" -> ((s, dir) => bruteTopKShared(s, dir)),

    // HYBRID retrieval via reciprocal-rank fusion — the production
    // retrieval shape (BM25+vector, or here: two vector signals).
    // Ranker A = cosine (normalized, direction-only relevance),
    // ranker B = raw inner product (MIPS — magnitude-weighted), both
    // exact over the same corpus, computed in ONE pass over the pair
    // set (the dot product is shared; cosine just divides by norms).
    // RRF with k=60 on integer-exact scaled arithmetic (see RrfScale).
    // HybridRrfSpec pins that fusion beats either ranker alone on a
    // planted-neighbor fixture. Scale: same broadcast-queries x
    // corpus-scan shape as s_knn_brute, one qid exchange for all
    // three windows.
    // MMR diversified re-ranking (Carbonell & Goldstein) — the
    // redundancy cut retrieval/curation pipelines run AFTER top-k:
    // greedily pick 5 of the brute top-10 maximizing
    // 0.7·rel(d) − 0.3·max_{s∈S} sim(d, s). Inherently sequential in
    // k, so both engines unroll the SAME 5 argmax rounds (first pick
    // = pure relevance); every score is the identical IEEE operation
    // sequence on bit-identical cosines, so the greedy path cannot
    // diverge. Scale: candidate and pair-sim frames are k-bounded per
    // query (10 rows / 90 sims) and pinned once; each round is a
    // k-bounded join + argmax — the cost profile of MMR is set by the
    // top-k stage that feeds it, not by k² on bounded k.
    "s_mmr_rerank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("rel").desc, col("nid").asc)
      val cand = broadcast(q).crossJoin(e)
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nid"), col("v"), col("nrm"),
          (dot / (col("qn") * col("nrm"))).as("rel"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("nid"), col("v"), col("nrm"), col("rel"))
        // k-bounded (10 rows x 10 queries): one partition, so the 4
        // greedy rounds run single-task stages instead of paying the
        // full shuffle-partition fan-out ~16 times on 100-row frames
        .coalesce(1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sims = cand.select(col("qid"), col("nid").as("na"),
          col("v").as("va"), col("nrm").as("nna"))
        .join(cand.select(col("qid"), col("nid").as("nb"),
          col("v").as("vb"), col("nrm").as("nnb")), Seq("qid"))
        .filter(col("na") =!= col("nb"))
        .select(col("qid"), col("na"), col("nb"),
          (dotCols("va", "vb") / (col("nna") * col("nnb"))).as("sim"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.scale.CacheRegistry.track(cand, sims)
      var sel = cand.groupBy(col("qid"))
        .agg(max_by(struct(col("nid"), (lit(0.7) * col("rel")).as("score")),
          struct(col("rel"), -col("nid"))).as("p"))
        .select(col("qid"), col("p.nid").as("nid"), lit(1).as("ord"),
          col("p.score").as("score"))
      for (r <- 2 to 5) {
        val pick = cand
          .join(sel.select(col("qid"), col("nid")), Seq("qid", "nid"),
            "left_anti")
          .join(sims.select(col("qid"), col("na").as("nid"), col("nb"),
              col("sim"))
            .join(sel.select(col("qid"), col("nid").as("nb")),
              Seq("qid", "nb")),
            Seq("qid", "nid"), "left")
          .groupBy(col("qid"), col("nid"), col("rel"))
          .agg(max(col("sim")).as("ms"))
          .withColumn("score",
            lit(0.7) * col("rel") - lit(0.3) * coalesce(col("ms"), lit(0.0)))
          .groupBy(col("qid"))
          .agg(max_by(struct(col("nid"), col("score")),
            struct(col("score"), -col("nid"))).as("p"))
          .select(col("qid"), col("p.nid").as("nid"), lit(r).as("ord"),
            col("p.score").as("score"))
        // sel feeds BOTH next-round inputs (anti-join + sim probe), so
        // an unbroken lineage doubles per round — 16 copies of the
        // round-1 subtree by round 5. The eager localCheckpoint
        // truncates it: each round's selected set (<= 50 rows) is
        // materialized once and the plan stays linear in rounds; the
        // prior round's blocks die as soon as the new one is live
        // (Checkpoints.free — the round-7 leak fix)
        val prev = sel
        sel = graft.scale.Checkpoints.cut(sel.unionByName(pick))
        graft.scale.Checkpoints.free(prev)
      }
      // the FINAL round's checkpoint blocks outlive the action —
      // deposit with the harness ledger (Checkpoints.free semantics:
      // Dataset.unpersist cannot reach LogicalRDD blocks) so Bench/
      // Verify release them instead of leaking ~50 rows per execution
      graft.scale.CacheRegistry.trackCheckpointed(sel)
      sel.select(col("qid"), col("ord"), col("nid"),
          round(col("score"), 4).as("score"))
        .orderBy(col("qid"), col("ord"))
    }),

    "s_hybrid_rrf" -> ((s, dir) => {
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"))
      val pairs = broadcast(q).crossJoin(e)
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nid"),
          (dot / (col("qn") * col("nrm"))).as("cos"), dot.as("ip"))
      rrfFuse(pairs)
    }),

    // Metadata-FILTERED vector search — same-class top-5 per query:
    // the retrieval shape every production vector store must support
    // (filter on structured metadata, THEN rank by similarity).
    // Pre-filter semantics: the label predicate is part of the join
    // condition, so ranking runs over the filtered corpus and top-5 is
    // exact under the filter — a post-filtered ANN would silently
    // return < k. The predicate sits in the broadcast hash join key
    // (label), so at 100 TB the corpus scan prunes to the matching
    // class partitions before any distance math.
    "s_knn_filtered" -> ((s, dir) => {
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("v").as("qv"), col("nrm").as("qn"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid").asc)
      broadcast(q)
        .join(e, col("qlabel") === col("label") &&
          col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nid"),
          (dot / (col("qn") * col("nrm"))).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"),
          col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // Sign-LSH (random hyperplane) bucketed ANN, emitted as a
    // self-verifying invariant: the query runs the full ANN path
    // (signatures -> bucket join -> ids-only dedup -> vector rejoin ->
    // exact-cosine re-rank) AND the exact brute-force top-10, computes
    // recall@10 per query, and emits ONE aggregate row
    // (n_queries, recall_ok). The ranked-output path itself is
    // `knnLshTopK` below (recall + cosine-parity property tests in
    // SimilaritySpec); its raw rows are hash-dependent so DuckDB can't
    // reproduce them — the invariant row is what the oracle checks
    // (a recall regression flips recall_ok -> red row).
    "s_knn_lsh" -> ((s, dir) => {
      val e = vecs(s, dir)
      recallInvariant(knnLshTopK(e), bruteTopKShared(s, dir), minMeanRecall = 0.5)
    }),

    // IVF (inverted-file) ANN — the other canonical scale path from
    // the builder brief: a tiny coarse-quantizer codebook (MLlib
    // KMeans, cosine distance, seeded) partitions the corpus into
    // inverted lists; queries probe only their nprobe nearest lists
    // and exact-re-rank inside them. Same self-verifying invariant
    // row as s_knn_lsh (raw top-k depends on the learned codebook, so
    // DuckDB can't reproduce it; the recall floor is the checkable
    // contract). Ranked output path: knnIvfTopK.
    "s_knn_ivf" -> ((s, dir) => {
      val e = vecs(s, dir)
      recallInvariant(knnIvfTopK(e), bruteTopKShared(s, dir), minMeanRecall = 0.5)
    }),

    // Product quantization — the remaining canonical ANN variant
    // (FAISS PQ): the corpus is ENCODED as m 4-bit codes per vector,
    // search scans the codes (64x narrower than the vectors) with
    // per-query ADC lookup tables, and the exact cosine re-rank runs
    // only on the top candidates. Same self-verifying invariant row as
    // LSH/IVF. Ranked path: knnPqTopK.
    "s_knn_pq" -> ((s, dir) => {
      val e = vecs(s, dir)
      recallInvariant(knnPqTopK(e), bruteTopKShared(s, dir), minMeanRecall = 0.5)
    }),

    // Exact maximum-inner-product search (MIPS) — the recsys retrieval
    // scoring, DISTINCT from cosine: user-item scores are raw dot
    // products, so high-norm items legitimately outrank nearer-angle
    // ones (cosine search normalizes exactly that away). Same
    // broadcast-queries / corpus-scan / per-query-window shape as
    // s_knn_brute; the window tops-k per query under AQE's partial
    // top-k, never a global sort of the pair space. The classic
    // norm-augmentation reduction (append sqrt(M^2 - |x|^2), search by
    // cosine) would let the LSH/IVF/PQ paths above serve MIPS
    // approximately — this exact twin is their target, the same
    // exact/sketch pairing as the dedup family.
    "s_knn_mips" -> ((s, dir) => {
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("ip").desc, col("nid").asc)
      broadcast(q).crossJoin(e).filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nid"), dot.as("ip"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("nid"), round(col("ip"), 4).as("ip"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // Int8 scalar quantization — the embedding-compression operator of
    // a vector pipeline (FAISS SQ8 / product-DB int8 storage): per-
    // vector symmetric scale = max|x| / 127, codes = round(x / scale),
    // 8x smaller than float64 and 4x smaller than float32 at ~1e-3
    // cosine error. Emits per-vector scale, a code checksum, the max
    // reconstruction error, and the dequantized-vs-original cosine —
    // all computed with the identical IEEE operation sequence in both
    // engines. Pure narrow projection: zero shuffle, and at 100 TB the
    // codes column (binary-packable) is what ships to the ANN index.
    "s_quantize" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("scale",
          expr("array_max(transform(v, x -> abs(x)))") / 127.0)
        .withColumn("codes", expr(
          """transform(v, x -> CASE WHEN scale = 0.0 THEN 0L
            |  ELSE cast(round(x / scale) as bigint) END)""".stripMargin))
        .withColumn("recon", expr("transform(codes, c -> c * scale)"))
      e.select(col("vec_id"),
          round(col("scale"), 6).as("scale_r"),
          expr("aggregate(codes, 0L, (a, c) -> a + c)").as("code_checksum"),
          round(expr("array_max(zip_with(v, recon, (a, b) -> abs(a - b)))"), 6)
            .as("max_abs_err"),
          when(col("scale") === 0.0, lit(1.0))
            .otherwise(round(dotCols("v", "recon") /
              (sqrt(dotCols("v", "v")) * sqrt(dotCols("recon", "recon"))), 4))
            .as("recon_cos"))
        .orderBy(col("vec_id"))
    }),

    // Distributed Lloyd's k-means (k=4, 3 rounds) on the integer
    // lattice — scale/KMeans.scala. The WHOLE iteration is exact
    // int64 arithmetic (quantize floor(x*1000), integer squared L2,
    // argmin fused into min(dist*k + cid), centroids floored back
    // onto the lattice), so the DuckDB oracle replays the identical
    // three rounds and must land on bit-identical cluster sizes,
    // inertia, AND centroid vectors — a fully oracle-gated iterative
    // ML operator, not a stats-band check. Per round: one corpus scan
    // + broadcast centroid cross + min-agg; update shuffles only
    // k x dims partial sums. The output is SCALAR-ONLY (gate
    // contract: the driver's comparer sorts every column and cannot
    // hash array cells — round-6 lesson): the k centroid vectors are
    // posexploded to (cluster_id, d, v) rows, k x dims = 256 rows
    // total, each carrying the cluster's n_points/inertia alongside.
    "s_kmeans" -> ((s, dir) => {
      val q = vecs(s, dir).select(col("vec_id"),
        expr("transform(v, x -> CAST(floor(x * 1000) AS BIGINT))").as("qv"))
      val (assigned, cent) =
        graft.scale.KMeans.lloydQuantized(s, q, k = 4, iters = 3)
      import s.implicits._
      val cdf = cent.zipWithIndex.toSeq.toDF("centroid", "cluster_id")
        .select(col("cluster_id").cast("long").as("cluster_id"),
          posexplode(col("centroid")).as(Seq("d", "v")))
        .select(col("cluster_id"), col("d").cast("long").as("d"), col("v"))
      assigned.groupBy(col("cid").as("cluster_id"))
        .agg(count(lit(1)).as("n_points"), sum(col("dist")).as("inertia"))
        .select(col("cluster_id").cast("long").as("cluster_id"),
          col("n_points"), col("inertia"))
        .join(broadcast(cdf), "cluster_id")
        .select(col("cluster_id"), col("n_points"), col("inertia"),
          col("d"), col("v"))
        .orderBy(col("cluster_id"), col("d"))
    }),

    // Per-label centroid: element-wise mean embedding per class — the
    // aggregation shape of IVF coarse quantizers and class prototypes.
    // posexplode + two-level hash agg; 64 x n_labels cells total.
    "s_label_centroid" -> ((s, dir) => {
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), (col("pos") + 1).as("dim"))
        // + 0.0 collapses IEEE negative zero so engines agree on "0.0"
        .agg((round(avg(col("x").cast("double")), 4) + lit(0.0)).as("v"))
        .orderBy(col("label"), col("dim"))
    }),

    // Semantic eval-set decontamination — the embedding-space twin of
    // TextPack's trigram t_decontam (the two run side by side in a
    // real pre-training funnel: lexical catches verbatim leakage,
    // cosine catches paraphrase leakage). Eval set = the bounded
    // vec_id < 50 slice (eval benchmarks are small by nature); every
    // train vector gets its max cosine against the whole eval set and
    // a contamination flag at 0.5 (the gaussian fixture's organic
    // near-miss band, so the flag partitions the output non-trivially;
    // production would use ~0.9 on clustered real embeddings — the
    // threshold is the only tunable). The flag compares the ROUNDED
    // score on both engines, so boundary values cannot split on
    // float-formatting.
    //
    // Scale shape: the eval side is broadcast (50 x 64 doubles); the
    // train side is ONE corpus scan with a codegen DotProduct per
    // (train, eval) pair and a map-side-combinable max — no shuffle
    // carries a vector, and the output is one row per train vector.
    "s_decontam_semantic" -> ((s, dir) => {
      val e = vecs(s, dir)
      val eval = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("eid"), col("v").as("ev"), col("nrm").as("en"))
      val train = e.filter(col("vec_id") >= 50)
      train.crossJoin(broadcast(eval))
        .groupBy(col("vec_id"))
        .agg(max(dotCols("v", "ev") / (col("nrm") * col("en"))).as("mc"))
        .select(col("vec_id"), round(col("mc"), 4).as("max_eval_cos"))
        .withColumn("is_contaminated", col("max_eval_cos") >= 0.5)
        .orderBy(col("vec_id"))
    })
  )

  /** Exact cosine top-10 per query vector (qid, nid, cos, rk). */
  /** Memoized + persisted brute top-10 (r14 optimization round): the
    * three self-verifying ANN rows (lsh/ivf/pq) each recomputed the
    * full brute pass as their recall target, and recallInvariant reads
    * the brute frame TWICE (hit join + per-query denominator) — so one
    * un-persisted brute subtree executed six times per bench across
    * the family for a deterministic ~100-row result. Session-lifetime
    * memo, byte-capped MemoPool (r15), like every other shared base. */
  private def bruteTopKShared(s: SparkSession, dir: String): DataFrame =
    graft.scale.MemoPool.getOrBuild(s, dir, "bruteTopK") {
      bruteTopK(vecs(s, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }(Seq(_))

  private[queries] def bruteTopK(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    broadcast(q).crossJoin(e).filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"),
        (dot / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"), col("rk"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Sign-LSH ANN top-10 per query (qid, nid, cos, rk) — the 100 TB
    * scale path.
    *
    * Parameters trade recall vs candidate volume. The fixture is
    * uniform gaussian — the worst case for LSH (nearest neighbors sit
    * near cos 0.4, i.e. 66 degrees): bit-agreement p ~ 1 - theta/pi
    * ~ 0.63, so short 4-bit signatures x 8 tables give ~2/3 recall
    * while pruning ~half the corpus per query. Real embedding corpora
    * are clustered; there longer signatures prune far harder at the
    * same recall, and this constant is the only thing to retune.
    *
    * Shuffle discipline (VERDICT r1): the bucket join and the
    * candidate dedup carry ONLY (qid, nid) id pairs — two longs per
    * row, never the 64-dim vectors; vectors rejoin AFTER the distinct,
    * where the deduped id set is small enough to broadcast against the
    * corpus scan (BroadcastHashJoin — the corpus side never shuffles).
    */
  private[queries] def knnLshTopK(e: DataFrame): DataFrame = {
    val bits = 4
    val tables = 8
    val dim = 64
    // hyperplane coefficients are generated ONCE at plan-build time
    // from a fixed seed and embedded as array literals — the per-row
    // work is a pure fold over the vector (codegen'd), not a hash
    // chain per (table, plane, dim)
    val rng = new scala.util.Random(42)
    val planes = Array.fill(tables, bits, dim)(rng.nextDouble() * 2 - 1)
    def sig(t: Int): Column =
      (0 until bits).map { p =>
        val d = graft.expr.DotProduct(col("v"), typedLit(planes(t)(p).toSeq))
        when(d > 0, lit(1L << (bits - 1 - p))).otherwise(lit(0L))
      }.reduce(_ + _)
    // narrow signature projection: (vec_id, tbl, sg) — no vectors
    val sigs = e.select(col("vec_id"),
      posexplode(array((0 until tables).map(sig).toIndexedSeq: _*))
        .as(Seq("tbl", "sg")))
    val qsigs = sigs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("tbl"), col("sg"))
    val candIds = broadcast(qsigs)
      .join(sigs, Seq("tbl", "sg"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"))
      .distinct()
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    broadcast(candIds)
      .join(e.select(col("vec_id").as("nid"), col("v"), col("nrm")), Seq("nid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("nid"), (dot / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"), col("rk"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Shared invariant harness for the ANN paths: computes recall@10
    * of `ann` against the exact `brute` top-10 and emits ONE row
    * (n_queries, recall_ok). A recall regression below the floor, or
    * a query the ANN path loses entirely, flips recall_ok -> red
    * CORRECTNESS row. */
  private def recallInvariant(ann: DataFrame, brute: DataFrame,
                              minMeanRecall: Double): DataFrame = {
    val a = ann.select(col("qid"), col("nid"))
    val b = brute.select(col("qid"), col("nid"))
    val hits = b.join(a, Seq("qid", "nid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("h"))
    // denominator = the brute top-k's ACTUAL row count per query, not
    // a hard-coded 10: on a corpus with < 11 vectors brute emits only
    // n-1 neighbors and a perfect ANN path would otherwise score
    // (n-1)/10 and flip the invariant red
    b.groupBy(col("qid")).agg(count(lit(1)).as("bc"))
      .join(hits, Seq("qid"), "left")
      .agg(count(lit(1)).as("n_queries"),
        (avg(coalesce(col("h"), lit(0L)) / col("bc")) >= minMeanRecall)
          .as("recall_ok"))
  }

  /** Product-quantization ANN top-10 (qid, nid, cos, rk) — FAISS PQ.
    *
    * Train: one KMeans per subspace (m subspaces x 64/m dims), each
    * fit on a seeded sample of the L2-NORMALIZED subvectors (PQ over
    * unit vectors makes squared-L2 ADC order equivalent to cosine
    * order). Codebooks are tiny BY DESIGN (m x ksub x 8 doubles) and
    * embed as plan-time literals, like the IVF centroids and the LSH
    * hyperplanes.
    *
    * Serve: the corpus is encoded ONCE into m small codes per vector
    * (8 bytes packed vs 512 bytes of float64 — the 64x scan-width
    * reduction is the whole point at 100 TB); each query precomputes
    * its m x ksub ADC distance table BEFORE the scan (classic ADC —
    * per candidate the distance is m table lookups, not arithmetic on
    * vectors), the top `rerank` candidate ids per query survive, and
    * the exact cosine re-rank runs on just those true vectors — the
    * sketch-prunes/exact-verifies discipline again. */
  private[queries] def knnPqTopK(e: DataFrame, m: Int = 8, ksub: Int = 16,
                                 rerank: Int = -1): DataFrame = {
    // Re-rank budget: on clustered real-world embeddings a small
    // constant suffices; the UNCLUSTERED gaussian fixture is ADC's
    // adversarial case (all subspace distances look alike), so the
    // default scales as n/8 (floor 64) to hold the recall contract at
    // every SF — still an 8x cut of exact work on top of the 64x
    // narrower candidate scan, and the knob a deployment tunes down
    // on real data. The count() is plan-time driver work like the
    // KMeans fits.
    val rr = if (rerank > 0) rerank
             else math.max(64L, e.count() / 8).toInt
    val sub = 64 / m
    val en = e.withColumn("vn", expr("transform(v, x -> x / nrm)"))
    // Codebook training is driver-local Lloyd's over ONE bounded
    // sample — exactly FAISS's train(): PQ codebooks are fit in
    // memory on a few thousand vectors regardless of corpus size, so
    // the driver work is O(sample), not O(corpus). (The previous
    // formulation ran 8 MLlib KMeans jobs over the same tiny sample;
    // per-job scheduling overhead was ~3/4 of the query's wall time.)
    // Sample membership is a pure function of vec_id (NOT
    // Dataset.sample, whose per-partition RNG draws a different row
    // set under a different partitioning), and the TakeOrdered fixes
    // the row order — so the codebooks, and with them the ADC
    // ranking, are reproducible across runs AND cluster layouts.
    val sample = en.select(col("vec_id"), col("vn"))
      .filter(pmod(col("vec_id"), lit(2)) === 0)
      .orderBy(col("vec_id")).limit(4096)
      .collect().map(_.getSeq[Double](1).toArray)
    val codebooks = (0 until m).map { mi =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
      val rnd = new scala.util.Random(42 + mi)
      // distinct shuffled indices: no duplicate initial centers (a
      // twin center never separates under Lloyd's), no crash on a
      // tiny sample (cycle) — and ksub zero vectors on an empty one
      val idx = rnd.shuffle(pts.indices.toVector)
      val centers = Array.tabulate(ksub) { c =>
        if (idx.isEmpty) new Array[Double](sub)
        else pts(idx(c % idx.length)).clone()
      }
      var it = 0
      while (it < 5) {
        val sums = Array.fill(ksub)(new Array[Double](sub))
        val cnts = new Array[Int](ksub)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d = 0.0; var i = 0
            while (i < sub) { val t = p(i) - centers(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += p(i); i += 1 }
          cnts(best) += 1
        }
        var c = 0
        while (c < ksub) { // empty cluster keeps its previous center
          if (cnts(c) > 0) {
            var i = 0
            while (i < sub) { centers(c)(i) = sums(c)(i) / cnts(c); i += 1 }
          }
          c += 1
        }
        it += 1
      }
      centers
    }
    def centLit(mi: Int): String =
      codebooks(mi).map(_.mkString("array(", ",", ")"))
        .mkString("array(", ",", ")")
    // 16 squared-L2 distances from a row's mi-th subvector to the
    // mi-th codebook — used once per vector at encode time and once
    // per QUERY (not per pair) to build the ADC lookup table
    def subDists(mi: Int, vecCol: String): String =
      s"""transform(${centLit(mi)}, cc -> aggregate(
         |  zip_with(slice($vecCol, ${mi * sub + 1}, $sub), cc,
         |           (a, b) -> (a - b) * (a - b)),
         |  0D, (acc, x) -> acc + x))""".stripMargin
    // encode: nearest-centroid code per subspace (ties -> first index)
    val codes = (0 until m).foldLeft(en.select(col("vec_id"), col("vn"))) {
      (df, mi) =>
        df.withColumn(s"d$mi", expr(subDists(mi, "vn")))
          .withColumn(s"c$mi",
            expr(s"cast(array_position(d$mi, array_min(d$mi)) as int) - 1"))
          .drop(s"d$mi")
    }.drop("vn")
    // per-query ADC tables, computed once before the candidate scan
    val q = en.filter(col("vec_id") < 10)
    val qTables = q.select(
      col("vec_id").as("qid") +:
        (0 until m).map(mi => expr(subDists(mi, "vn")).as(s"dt$mi")): _*)
    val adc = (0 until m).map(mi => s"element_at(dt$mi, c$mi + 1)")
      .mkString(" + ")
    import org.apache.spark.sql.expressions.Window
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    val cand = broadcast(qTables)
      .crossJoin(codes).filter(col("qid") =!= col("vec_id"))
      .withColumn("adc", expr(adc))
      .withColumn("ark", row_number().over(wAdc))
      .filter(col("ark") <= rr)
      .select(col("qid"), col("vec_id").as("nid"))
    // exact cosine re-rank on the true vectors, candidates only
    val wCos = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    cand
      .join(broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"))), Seq("qid"))
      .join(e.select(col("vec_id").as("nid"), col("v"), col("nrm")),
        Seq("nid"))
      .select(col("qid"), col("nid"),
        (dotCols("qv", "v") / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rk", row_number().over(wCos))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"),
        col("rk"))
  }

  /** IVF ANN top-10 per query (qid, nid, cos, rk).
    *
    * Train: MLlib KMeans (k=`lists`, cosine distance, fixed seed) fits
    * the coarse quantizer distributedly — at 100 TB you fit it on a
    * sample, which is exactly what FAISS-style IVF training does; the
    * codebook itself is tiny BY DESIGN (lists x dim doubles), so
    * embedding the centroids as plan-time literals for the query
    * probe is the intended deployment shape, not a driver bottleneck.
    *
    * Serve: corpus assignment is one model.transform (narrow, no
    * shuffle); each query scores the codebook, probes its `nprobe`
    * closest lists, and the candidate (qid, nid) id pairs — never the
    * vectors — flow through the dedup, then vectors rejoin broadcast-
    * style for the exact cosine re-rank, same discipline as the LSH
    * path. */
  private[queries] def knnIvfTopK(e: DataFrame,
                                  lists: Int = 16, nprobe: Int = 6): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val fe = e.withColumn("fv", array_to_vector(col("v")))
    val model = new KMeans()
      .setK(lists).setSeed(42).setMaxIter(5)
      // random init: kmeans|| runs ~2 Spark jobs per init step, and a
      // coarse quantizer doesn't need init quality — 5 Lloyd
      // iterations from a seeded random start converge equivalently
      // here (recall parity spec-asserted)
      .setInitMode("random")
      .setDistanceMeasure("cosine")
      .setFeaturesCol("fv").setPredictionCol("list")
      // fit on a DETERMINISTIC 25% sample — THE FAISS training recipe
      // (a coarse quantizer needs ~100s of points per centroid, not
      // the corpus); at 100 TB this is what keeps training O(sample).
      // id-keyed, NOT Dataset.sample: the PQ path's rule — a
      // per-partition sample draws different rows under a different
      // core count or file split, so codebooks (and the recall row)
      // would vary by ENVIRONMENT, not data. Recall floor is
      // oracle-pinned, sample-vs-full parity spec-asserted.
      .fit(fe.filter(pmod(col("vec_id"), lit(4)) === 0))
    val assigned = model.transform(fe)
      .select(col("vec_id").as("nid"), col("list"))
    val cents = model.clusterCenters.map(_.toArray)
    // per-query cosine to every centroid -> top-nprobe lists
    val centCos: Seq[Column] = cents.toIndexedSeq.map { c =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      graft.expr.DotProduct(col("v"), typedLit(c.toSeq)) / (col("nrm") * lit(cn))
    }
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    import org.apache.spark.sql.expressions.Window
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("ccos").desc, col("list").asc)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"),
        posexplode(array(centCos: _*)).as(Seq("list", "ccos")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("list"))
    val candIds = broadcast(probes)
      .join(assigned, Seq("list"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    broadcast(candIds)
      .join(e.select(col("vec_id").as("nid"), col("v"), col("nrm")), Seq("nid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("nid"), (dot / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"), col("rk"))
      .orderBy(col("qid"), col("rk"))
  }

  /** The MMR oracle unrolls the same greedy rounds 2..5 (generated —
    * one definition of the score and tie-break shared with the Spark
    * side's max_by). a{k} accumulates the selected set. */
  private val mmrRounds: String = (2 to 5).map { k =>
    s"""s$k AS (
       |  SELECT qid, nid, $k AS ord, score FROM (
       |    SELECT x.qid, x.nid, x.score,
       |      row_number() OVER (PARTITION BY x.qid
       |        ORDER BY x.score DESC, x.nid) AS rn
       |    FROM (
       |      SELECT c.qid, c.nid,
       |        0.7 * c.rel - 0.3 * coalesce((
       |          SELECT max(s.sim) FROM sims s JOIN a${k - 1} t
       |            ON t.qid = s.qid AND t.nid = s.nb
       |          WHERE s.qid = c.qid AND s.na = c.nid), 0.0) AS score
       |      FROM cand c
       |      WHERE NOT EXISTS (SELECT 1 FROM a${k - 1} t
       |        WHERE t.qid = c.qid AND t.nid = c.nid)) x) WHERE rn = 1),
       |a$k AS (SELECT * FROM a${k - 1} UNION ALL SELECT * FROM s$k)"""
      .stripMargin
  }.mkString(",\n")

  override def oracleSql: Map[String, String] = Map(
    "s_mmr_rerank" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn
         |      FROM n WHERE vec_id < 10),
         |p AS (
         |  SELECT qid, n.vec_id AS nid,
         |    list_dot_product(qv, n.v) / (qn * n.nrm) AS rel,
         |    n.v AS v, n.nrm AS nrm
         |  FROM q, n WHERE n.vec_id <> qid),
         |cand AS (SELECT qid, nid, rel, v, nrm FROM (
         |  SELECT p.*, row_number() OVER (PARTITION BY qid
         |    ORDER BY rel DESC, nid) AS rk FROM p) WHERE rk <= 10),
         |sims AS (
         |  SELECT a.qid, a.nid AS na, b.nid AS nb,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
         |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid <> b.nid),
         |s1 AS (SELECT qid, nid, 1 AS ord, 0.7 * rel AS score FROM (
         |  SELECT qid, nid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY rel DESC, nid) AS rn FROM cand) WHERE rn = 1),
         |a1 AS (SELECT * FROM s1),
         |$mmrRounds
         |SELECT qid, CAST(ord AS INT) AS ord, nid,
         |  round(score, 4) AS score
         |FROM a5 ORDER BY qid, ord""".stripMargin,
    "s_knn_brute" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |p AS (
        |  SELECT qid, n.vec_id AS nid,
        |    list_dot_product(qv, n.v) / (qn * n.nrm) AS c
        |  FROM q, n WHERE n.vec_id <> qid),
        |r AS (SELECT qid, nid, c,
        |  row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid ASC) AS rk
        |  FROM p)
        |SELECT qid, nid, round(c, 4) AS cos, rk FROM r
        |WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,

    // the same three Lloyd rounds in chained CTEs: quantize, seed at
    // vec_id {0, s, 2s, 3s}, then per round assign by
    // min(intL2 * 4 + cid) and re-floor the centroid means. Verified
    // against an independent dense reference during development; any
    // divergence from the Spark side is a REAL reproducibility break,
    // not float noise.
    "s_kmeans" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |dims AS (
        |  SELECT vec_id, t.d, qv[t.d + 1] AS v
        |  FROM q, range(64) t(d)),
        |step AS (SELECT count(*) // 4 AS st FROM q),
        |c0 AS (
        |  SELECT vec_id // (SELECT st FROM step) AS cid, d, v
        |  FROM dims
        |  WHERE vec_id % (SELECT st FROM step) = 0
        |    AND vec_id // (SELECT st FROM step) < 4),
        |a1 AS (
        |  SELECT vec_id, min(key) AS key FROM (
        |    SELECT dims.vec_id, c0.cid,
        |      sum((dims.v - c0.v) * (dims.v - c0.v)) * 4 + c0.cid AS key
        |    FROM dims JOIN c0 USING (d)
        |    GROUP BY dims.vec_id, c0.cid) GROUP BY 1),
        |c1n AS (
        |  SELECT a1.key % 4 AS cid, dims.d,
        |    CAST(floor(CAST(sum(dims.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
        |  FROM a1 JOIN dims USING (vec_id) GROUP BY 1, 2),
        |c1 AS (
        |  SELECT c0.cid, c0.d, coalesce(c1n.v, c0.v) AS v
        |  FROM c0 LEFT JOIN c1n ON c0.cid = c1n.cid AND c0.d = c1n.d),
        |a2 AS (
        |  SELECT vec_id, min(key) AS key FROM (
        |    SELECT dims.vec_id, c1.cid,
        |      sum((dims.v - c1.v) * (dims.v - c1.v)) * 4 + c1.cid AS key
        |    FROM dims JOIN c1 USING (d)
        |    GROUP BY dims.vec_id, c1.cid) GROUP BY 1),
        |c2n AS (
        |  SELECT a2.key % 4 AS cid, dims.d,
        |    CAST(floor(CAST(sum(dims.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
        |  FROM a2 JOIN dims USING (vec_id) GROUP BY 1, 2),
        |c2 AS (
        |  SELECT c1.cid, c1.d, coalesce(c2n.v, c1.v) AS v
        |  FROM c1 LEFT JOIN c2n ON c1.cid = c2n.cid AND c1.d = c2n.d),
        |a3 AS (
        |  SELECT vec_id, min(key) AS key FROM (
        |    SELECT dims.vec_id, c2.cid,
        |      sum((dims.v - c2.v) * (dims.v - c2.v)) * 4 + c2.cid AS key
        |    FROM dims JOIN c2 USING (d)
        |    GROUP BY dims.vec_id, c2.cid) GROUP BY 1),
        |c3n AS (
        |  SELECT a3.key % 4 AS cid, dims.d,
        |    CAST(floor(CAST(sum(dims.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
        |  FROM a3 JOIN dims USING (vec_id) GROUP BY 1, 2),
        |c3 AS (
        |  SELECT c2.cid, c2.d, coalesce(c3n.v, c2.v) AS v
        |  FROM c2 LEFT JOIN c3n ON c2.cid = c3n.cid AND c2.d = c3n.d),
        |stats AS (
        |  SELECT CAST(key % 4 AS BIGINT) AS cluster_id,
        |    CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(sum(key // 4) AS BIGINT) AS inertia
        |  FROM a3 GROUP BY 1)
        |SELECT stats.cluster_id, n_points, inertia,
        |  CAST(c3.d AS BIGINT) AS d, c3.v AS v
        |FROM stats JOIN c3 ON stats.cluster_id = c3.cid
        |ORDER BY stats.cluster_id, d""".stripMargin,

    // identical rankers, ranks, truncation, and integer RRF scale as
    // the Spark side; `//` keeps every term in int64
    "s_hybrid_rrf" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |p AS (
        |  SELECT qid, n.vec_id AS nid,
        |    list_dot_product(qv, n.v) / (qn * n.nrm) AS c,
        |    list_dot_product(qv, n.v) AS ip
        |  FROM q, n WHERE n.vec_id <> qid),
        |r AS (SELECT qid, nid,
        |  row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid ASC) AS ra,
        |  row_number() OVER (PARTITION BY qid ORDER BY ip DESC, nid ASC) AS rb
        |  FROM p),
        |f AS (SELECT qid, nid,
        |  (CASE WHEN ra <= 10 THEN 142813628717760 // (60 + ra) ELSE 0 END) +
        |  (CASE WHEN rb <= 10 THEN 142813628717760 // (60 + rb) ELSE 0 END)
        |    AS rrf_scaled
        |  FROM r WHERE ra <= 10 OR rb <= 10),
        |g AS (SELECT qid, nid, rrf_scaled,
        |  row_number() OVER (PARTITION BY qid
        |    ORDER BY rrf_scaled DESC, nid ASC) AS rk
        |  FROM f)
        |SELECT qid, nid, CAST(rrf_scaled AS BIGINT) AS rrf_scaled, rk
        |FROM g WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,

    "s_knn_mips" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |p AS (
        |  SELECT qid, e.vec_id AS nid, list_dot_product(qv, e.v) AS ip
        |  FROM q, e WHERE e.vec_id <> qid),
        |r AS (SELECT qid, nid, ip,
        |  row_number() OVER (PARTITION BY qid ORDER BY ip DESC, nid ASC) AS rk
        |  FROM p)
        |SELECT qid, nid, round(ip, 4) AS ip, rk FROM r
        |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    "s_knn_filtered" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
        |      FROM e),
        |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv, nrm AS qn
        |      FROM n WHERE vec_id < 10),
        |p AS (
        |  SELECT qid, n.vec_id AS nid,
        |    list_dot_product(qv, n.v) / (qn * n.nrm) AS c
        |  FROM q JOIN n ON n.label = q.qlabel AND n.vec_id <> qid),
        |r AS (SELECT qid, nid, c,
        |  row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid ASC) AS rk
        |  FROM p)
        |SELECT qid, nid, round(c, 4) AS cos, rk FROM r
        |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    "s_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM e),
        |c AS (
        |  SELECT vec_id, v, scale,
        |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(round(x / scale) AS BIGINT) END) AS codes
        |  FROM q),
        |r AS (
        |  SELECT vec_id, v, scale, codes,
        |    list_transform(codes, cd -> cd * scale) AS recon
        |  FROM c)
        |SELECT vec_id,
        |  round(scale, 6) AS scale_r,
        |  CAST(list_sum(codes) AS BIGINT) AS code_checksum,
        |  round(list_max([abs(v[i] - recon[i]) for i in range(1, len(v) + 1)]),
        |        6) AS max_abs_err,
        |  CASE WHEN scale = 0 THEN 1.0
        |       ELSE round(list_dot_product(v, recon) /
        |         (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(recon, recon))),
        |         4) END AS recon_cos
        |FROM r ORDER BY vec_id""".stripMargin,

    "s_label_centroid" ->
      """SELECT label, i.i AS dim,
        |  round(avg(CAST(embedding[i.i] AS DOUBLE)), 4) + 0.0 AS v
        |FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "s_decontam_semantic" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |ev AS (SELECT vec_id AS eid, v AS evv, nrm AS en FROM n WHERE vec_id < 50),
        |mc AS (
        |  SELECT t.vec_id,
        |    round(max(list_dot_product(t.v, ev.evv) / (t.nrm * ev.en)), 4)
        |      AS max_eval_cos
        |  FROM n t, ev WHERE t.vec_id >= 50 GROUP BY 1)
        |SELECT vec_id, max_eval_cos, max_eval_cos >= 0.5 AS is_contaminated
        |FROM mc ORDER BY vec_id""".stripMargin,

    // The ANN paths emit recall invariants (see queries): the Spark
    // side genuinely computes ANN-vs-exact recall@10; the oracle pins
    // the expected invariant. A recall regression (< 0.5 mean) or a
    // query the ANN path loses flips the row red.
    "s_knn_lsh" ->
      "SELECT CAST(10 AS BIGINT) AS n_queries, true AS recall_ok",
    "s_knn_ivf" ->
      "SELECT CAST(10 AS BIGINT) AS n_queries, true AS recall_ok",
    "s_knn_pq" ->
      "SELECT CAST(10 AS BIGINT) AS n_queries, true AS recall_ok"
  )
}
