package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpus generator matching the driver
  * testdata's shape (TESTDATA.md tables), for the scale-growth
  * harness (ScaleGrowth main, ScaleGrowthSpec): measuring how the
  * dedup/ANN/graph operators grow from 1x to 10x requires a 10x
  * corpus the driver does not ship.
  *
  * Shape matched to /root/testdata/sf0.1 (measured, not assumed):
  *  - documents: word-salad text over the fixture's own ~31-word
  *    vocabulary (read from a reference dir), 10-100 words uniform
  *    (observed min/max/avg 10/100/54), source = src0..src19, lang
  *    weighted like the fixture (en heaviest), and ~5% of docs are
  *    PLANTED near-dups of a base doc with ~2% word substitution —
  *    3-shingle Jaccard vs base ~0.9, comfortably over the packs'
  *    0.8 threshold, with some substitution-free copies landing as
  *    exact dups (the fixture has those too);
  *  - embeddings: 64-dim standard-gaussian float vectors (the pack
  *    comments document the fixture as uniform gaussian — LSH's
  *    worst case), label uniform 0..9;
  *  - orders/lineitem: the co-purchase graph shape — basket sizes
  *    1..7 uniform (TPC-H-ish avg 4), part/supplier/customer keys
  *    uniform over universes that scale WITH the corpus (TPC-H
  *    scaling: at 10x rows there are 10x parts), which is what keeps
  *    the co-occurrence graph's density constant instead of
  *    quadratically densifying.
  *
  * All randomness is xxhash64(id, tag, seed)-derived: distributed,
  * partition-count-independent, reproducible — no RNG state, no
  * driver loops. Generation is a pure map over spark.range.
  */
object SyntheticCorpus {

  /** Bumped whenever generated CONTENT changes for the same seed —
    * the corpus-reuse gate (ScaleGrowth.tableCurrent) compares this
    * against the `_GRAFT_GEN_VERSION` marker writeCorpus drops, so a
    * generator change can never be measured against a stale on-disk
    * corpus (r9 review finding: the vocab widening changed documents
    * content with no schema change, invisible to the _SUCCESS+schema
    * probe). The marker is PER TABLE (inside each <table>.parquet
    * dir, written right after that table's commit): a directory-wide
    * marker re-opened the hole for SUBSET regeneration — regenerating
    * only `documents` into a dir whose other tables were cut under an
    * older version would have stamped the whole dir current (ADVICE
    * r9). v2 = the ×64 vocabulary widening. */
  val GenVersion = 2

  /** Drop the content-version marker inside a just-written table dir.
    * Spark's overwrite replaced the directory, so the marker can only
    * be present if THIS table completed under THIS generator version. */
  private def stampTable(outDir: String, table: String): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, s"$table.parquet",
        "_GRAFT_GEN_VERSION"),
      GenVersion.toString.getBytes("UTF-8"))

  private def u(tag: Int, seed: Long, cols: org.apache.spark.sql.Column*) =
    pmod(xxhash64((cols :+ lit(tag) :+ lit(seed)): _*), lit(1000000L))
      .cast("double") / 1000000.0

  /** n documents over the vocabulary of `refDir`'s documents table,
    * WIDENED ×`vocabWiden` by deterministic suffix variants
    * (w, w1, w2, ...). Vocabulary is collected once — bounded
    * (fixture: 31 base words, Heaps-law small for any real corpus
    * slice).
    *
    * Why widen (VERDICT r8 item 6): the fixture's raw ~31-word
    * vocabulary yields only ~31³ ≈ 30k possible 3-shingles, which the
    * 1000× tier's ~270M tokens SATURATE — every doc pair shares
    * shingles by pigeonhole, so the minhash top decade measured the
    * fixture, not the operator. At the default widen of 64 the vocab
    * is ~2k words → ~7.8e9 possible shingles ≫ the 1000× tier's
    * shingle draw, so unrelated docs share essentially nothing and
    * candidate growth tracks the planted dups again. Planted-dup
    * semantics are vocabulary-independent (substitution rate fixed at
    * ~2%, Jaccard vs base ~0.9 regardless of vocab size). */
  def documents(s: SparkSession, refDir: String, n: Long, seed: Long,
                vocabWiden: Int = 64): DataFrame = {
    val baseVocab = graft.io.Tables(s, refDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().orderBy(col("w"))
      .collect().map(_.getString(0)) // bounded: vocabulary, not corpus
    require(baseVocab.nonEmpty, s"empty vocabulary from $refDir")
    // deterministic widening: sorted base words, then per-word suffix
    // variants in suffix order — stable element_at indexing across
    // runs and partition counts. `.distinct` guards the case where a
    // base word equals another base word + digit suffix ("w", "w1"):
    // the collision would double that entry's draw probability and
    // overstate the de-saturation math (a no-op on the current
    // digit-free fixture vocabulary — order is preserved, so existing
    // measurements are unchanged)
    val vocab = baseVocab.flatMap(w =>
      w +: (1 until vocabWiden).map(k => s"$w$k")).distinct
    val vlitSql = vocab
      .map(w => "'" + w.replace("'", "''") + "'")
      .mkString("array(", ",", ")")
    val nBase = n - n / 20 // 5% planted dups
    val base = s.range(nBase).select(
      col("id").as("doc_id"),
      expr(s"""transform(
        |  sequence(1, 10 + pmod(xxhash64(id, 1, $seed), 91)),
        |  i -> element_at($vlitSql,
        |         cast(pmod(xxhash64(id, i, ${seed + 1}), ${vocab.length}) + 1 as int)))"""
        .stripMargin).as("words"),
      concat(lit("src"), pmod(xxhash64(col("id"), lit(2), lit(seed)), lit(20)))
        .as("source"),
      // lang weights from the fixture: en .42, de .16, es .14, fr .14, zh .14
      element_at(array(lit("en"), lit("de"), lit("es"), lit("fr"), lit("zh")),
        (when(u(3, seed, col("id")) < 0.42, 0)
          .when(u(3, seed, col("id")) < 0.58, 1)
          .when(u(3, seed, col("id")) < 0.72, 2)
          .when(u(3, seed, col("id")) < 0.86, 3)
          .otherwise(4) + 1)).as("lang"))
    // dup k copies base doc (k mapped uniformly over bases) with ~2%
    // per-word substitution — a self-contained broadcast-free join on
    // the derived base_id
    val dups = s.range(n / 20).select(
      (col("id") + nBase).as("doc_id"),
      pmod(xxhash64(col("id"), lit(4), lit(seed)), lit(nBase)).as("base_id"))
    val dupDocs = dups.join(
        base.select(col("doc_id").as("base_id"), col("words"),
          col("source"), col("lang")), "base_id")
      .select(col("doc_id"),
        expr(s"""transform(words, (w, i) ->
          |  CASE WHEN pmod(xxhash64(doc_id, i, ${seed + 2}), 50) = 0
          |       THEN element_at($vlitSql,
          |              cast(pmod(xxhash64(doc_id, i, ${seed + 3}), ${vocab.length}) + 1 as int))
          |       ELSE w END)""".stripMargin).as("words"),
        col("source"), col("lang"))
    base.select(col("doc_id"), col("words"), col("source"), col("lang"))
      .unionByName(dupDocs)
      .select(col("doc_id"),
        array_join(col("words"), " ").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
  }

  /** n 64-dim gaussian embeddings (Box-Muller over two hash uniforms
    * per dimension), label uniform 0..9. */
  def embeddings(s: SparkSession, n: Long, seed: Long): DataFrame =
    s.range(n).select(
      col("id").as("vec_id"),
      expr(s"""transform(sequence(0, 63), d -> cast(
        |  sqrt(-2.0 * ln((pmod(xxhash64(id, d, $seed), 1000000) + 0.5) / 1000000.0)) *
        |  cos(6.283185307179586 *
        |      (pmod(xxhash64(id, d, ${seed + 1}), 1000000) + 0.5) / 1000000.0)
        |  as float))""".stripMargin).as("embedding"),
      pmod(xxhash64(col("id"), lit(9), lit(seed)), lit(10)).cast("int")
        .as("label"))

  /** orders + lineitem for the co-purchase graph: nOrders orders over
    * scaled key universes; basket size 1..7. Only the columns the
    * graph/market-basket queries read. */
  def ordersAndLineitem(s: SparkSession, nOrders: Long, nParts: Long,
                        nSupp: Long, nCust: Long, seed: Long):
      (DataFrame, DataFrame) = {
    val orders = s.range(nOrders).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id"), lit(10), lit(seed)), lit(nCust)).as("o_custkey"),
      // ly_bucketed_join's aggregate input; column-pruned away by
      // every other measured query, so adding it costs nothing there
      (pmod(xxhash64(col("id"), lit(12), lit(seed)), lit(100000L))
        .cast("double") / 100.0 + 1000.0).as("o_totalprice"))
    val lineitem = s.range(nOrders).select(
      col("id").as("l_orderkey"),
      explode(expr(s"sequence(1, 1 + pmod(xxhash64(id, 11, $seed), 7))"))
        .as("pos"))
      .select(col("l_orderkey"),
        pmod(xxhash64(col("l_orderkey"), col("pos"), lit(seed + 1)), lit(nParts))
          .as("l_partkey"),
        pmod(xxhash64(col("l_orderkey"), col("pos"), lit(seed + 2)), lit(nSupp))
          .as("l_suppkey"))
    (orders, lineitem)
  }

  /** Write a full corpus dir at `scale` x the sf0.1 shapes
    * (docs 5k, embeddings 2k, orders 150k, parts 20k, suppliers 1k,
    * customers 15k at scale=1). */
  def writeCorpus(s: SparkSession, refDir: String, outDir: String,
                  scale: Int, seed: Long = 20260814L,
                  tables: Seq[String] = Seq("documents", "embeddings",
                    "orders", "lineitem", "customer", "supplier")): Unit = {
    def want(t: String) = tables.contains(t)
    // the planted-twin ops derive ids as id + PlantedOffset — a corpus
    // whose real ids reach the offset silently corrupts their
    // semantics (the round-7 100x overflow of the original 100k
    // offset), so enforce the bound where the ids are minted
    require(5000L * scale < graft.queries.DedupPack.PlantedOffset &&
        2000L * scale < graft.queries.DedupPack.PlantedOffset,
      s"corpus scale $scale mints ids past PlantedOffset " +
        s"(${graft.queries.DedupPack.PlantedOffset}) — raise the offset first")
    if (want("documents")) {
      documents(s, refDir, 5000L * scale, seed)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      stampTable(outDir, "documents")
    }
    if (want("embeddings")) {
      embeddings(s, 2000L * scale, seed + 100)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      stampTable(outDir, "embeddings")
    }
    if (want("orders") || want("lineitem")) {
      val (o, l) = ordersAndLineitem(s, 150000L * scale, 20000L * scale,
        1000L * scale, 15000L * scale, seed + 200)
      if (want("orders")) {
        o.write.mode("overwrite").parquet(s"$outDir/orders.parquet")
        stampTable(outDir, "orders")
      }
      if (want("lineitem")) {
        l.write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
        stampTable(outDir, "lineitem")
      }
    }
    // key-only dimension tables: the geo family derives its point
    // scatter purely from the keys, so these suffice for its growth
    // measurement (10x keys = 10x point density on the fixed grid)
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    if (want("customer")) {
      s.range(1, 15000L * scale + 1)
        .select(col("id").as("c_custkey"),
          // ly_bucketed_join's group key (5 segments, hash-uniform)
          element_at(array(segs.map(lit): _*),
            (pmod(xxhash64(col("id"), lit(seed + 300)), lit(5)) + 1)
              .cast("int")).as("c_mktsegment"))
        .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
      stampTable(outDir, "customer")
    }
    if (want("supplier")) {
      s.range(1, 1000L * scale + 1)
        .select(col("id").as("s_suppkey"))
        .write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
      stampTable(outDir, "supplier")
    }
  }
}
