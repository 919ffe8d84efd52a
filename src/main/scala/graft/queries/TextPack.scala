package graft.queries

import graft.QueryPack
import graft.io.Tables
import graft.text.TextFeatures._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * (builder brief: language-ID, quality scoring, token counting,
  * document fingerprinting), over the `documents` table. The reference
  * has no distributed text ops at all — its only text processing is a
  * driver-side pandas `.apply` (data_utils.py:160-215, SURVEY.md X1);
  * every operator here is a pure Catalyst expression pipeline: one
  * narrow projection stage per document, no shuffle except final
  * deterministic ordering, trivially data-parallel at 100 TB.
  */
object TextPack extends QueryPack {

  // Marker sets for the n-gram/stopword language-ID heuristic and
  // quality scoring. Tiny and broadcast-free: they compile into the
  // expression tree as literals.
  private val stopwords = Seq("the", "a")
  private val techWords = Seq("data", "table", "row", "column", "key", "value")
  private val opsWords  = Seq("join", "merge", "sort", "filter", "scan", "agg")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens + distinct tokens + a BPE-ish
    // regex token count. Pure projection — scales linearly.
    "t_tokens" -> ((s, dir) => {
      val toks = tokens(col("text"))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_uniq"),
          size(tokensRegex(col("text"))).as("n_bpeish"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring: length/stopword/short-token ratios + a bucket
    // label — the heuristics an LLM-data pipeline uses to drop junk
    // documents before training.
    "t_quality" -> ((s, dir) => {
      val toks = tokens(col("text"))
      val n = size(toks)
      val avgLen = expr(
        "aggregate(transform(split(text, ' '), w -> length(w)), 0, (acc, x) -> acc + x)")
        .cast("double") / n
      val stopR = ratioIn(toks, stopwords)
      val shortR = size(filter(toks, w => length(w) <= 2)) / n
      Tables(s, dir, "documents")
        .select(col("doc_id"), n.as("n_tokens"),
          round(avgLen, 4).as("avg_word_len"),
          round(stopR, 4).as("stop_ratio"),
          round(shortR, 4).as("short_ratio"),
          when(stopR > 0.15 || shortR > 0.2, "low")
            .when(n.between(20, 200) && avgLen >= 4.0, "high")
            .otherwise("medium").as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID: marker-token relative-frequency heuristic (the
    // classic stopword-profile method, shrunk to the fixture's synthetic
    // vocabulary). Deterministic argmax with explicit tie order.
    "t_langid" -> ((s, dir) => {
      val toks = tokens(col("text"))
      val sStop = ratioIn(toks, stopwords)
      val sTech = ratioIn(toks, techWords)
      val sOps = ratioIn(toks, opsWords)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          round(sStop, 4).as("score_stop"),
          round(sTech, 4).as("score_tech"),
          round(sOps, 4).as("score_ops"),
          when(sStop >= 0.08, "stopword_heavy")
            .when(sTech > sOps, "tech")
            .when(sOps > sTech, "ops")
            .otherwise("mixed").as("guess"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprinting: position-weighted char fingerprint
    // (order-sensitive, cross-engine-exact) via the codegen'd
    // CharFingerprint expression (HOF-parity spec-asserted) — the
    // cheap first pass of exact dedup.
    "t_fingerprint" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), graft.expr.CharFingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Exact TF-IDF, top-3 terms per document — the oracle-checked
    // relational twin of the MLlib HashingTF+IDF pipeline
    // (graft.text.TfIdf), the same pattern as m1_freq_index for
    // StringIndexer. Shape: explode -> two hash aggs (term freq per
    // doc, doc freq per term) -> broadcast the term-level df (vocab-
    // sized, small by Heaps' law) back onto the doc-term rows -> per-
    // doc top-k window. Ranking uses the ROUNDED score so both
    // engines rank identical values; ties break on the term.
    "t_tfidf" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      val tf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("w").asc)
      tf.join(broadcast(dfreq), Seq("w"))
        .crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log(col("n").cast("double") / col("df")), 4))
        .withColumn("rk", row_number().over(win))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("w"), col("tfidf"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // Deterministic train/eval split by content fingerprint — the
    // held-out-split operator of a training-data pipeline. Hash-based
    // (NOT rand()): assignment is reproducible across runs, retries,
    // and engines, and documents keep their split when the corpus
    // grows — exactly why production pipelines split on content/URL
    // hashes instead of random numbers.
    "t_split" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          when(pmod(graft.expr.CharFingerprint(col("text")), lit(100)) < 80,
            "train").otherwise("eval").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("split"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "t_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t_quality" ->
      """WITH q AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |m AS (
        |  SELECT doc_id, len(w) AS n_tokens,
        |    list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w) AS avg_len,
        |    len(list_filter(w, x -> x IN ('the', 'a'))) * 1.0 / len(w) AS stop_r,
        |    len(list_filter(w, x -> len(x) <= 2)) * 1.0 / len(w) AS short_r
        |  FROM q)
        |SELECT doc_id, n_tokens,
        |  round(avg_len, 4) AS avg_word_len,
        |  round(stop_r, 4) AS stop_ratio,
        |  round(short_r, 4) AS short_ratio,
        |  CASE WHEN stop_r > 0.15 OR short_r > 0.2 THEN 'low'
        |       WHEN n_tokens BETWEEN 20 AND 200 AND avg_len >= 4.0 THEN 'high'
        |       ELSE 'medium' END AS quality
        |FROM m ORDER BY doc_id""".stripMargin,

    "t_langid" ->
      """WITH q AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |m AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(w, x -> x IN ('the', 'a'))) * 1.0 / len(w) AS s_stop,
        |    len(list_filter(w, x -> x IN ('data','table','row','column','key','value'))) * 1.0 / len(w) AS s_tech,
        |    len(list_filter(w, x -> x IN ('join','merge','sort','filter','scan','agg'))) * 1.0 / len(w) AS s_ops
        |  FROM q)
        |SELECT doc_id, lang,
        |  round(s_stop, 4) AS score_stop,
        |  round(s_tech, 4) AS score_tech,
        |  round(s_ops, 4) AS score_ops,
        |  CASE WHEN s_stop >= 0.08 THEN 'stopword_heavy'
        |       WHEN s_tech > s_ops THEN 'tech'
        |       WHEN s_ops > s_tech THEN 'ops'
        |       ELSE 'mixed' END AS guess
        |FROM m ORDER BY doc_id""".stripMargin,

    // CAST AS BIGINT: DuckDB list_sum() yields HUGEINT (arrow
    // decimal128), Spark's CharFingerprint emits bigint.
    "t_fingerprint" ->
      """SELECT doc_id,
        |  CAST(list_sum([unicode(text[i]) * i for i in range(1, length(text) + 1)])
        |    % 1000000007 AS BIGINT) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.w,
        |    round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 4) AS tfidf
        |  FROM tf JOIN dfreq USING (w) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, w, tfidf, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, w ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, w, tfidf FROM r
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "t_split" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_sum([unicode(text[i]) * i for i in range(1, length(text) + 1)])
        |      % 1000000007 AS fp
        |  FROM documents)
        |SELECT CASE WHEN fp % 100 < 80 THEN 'train' ELSE 'eval' END AS split,
        |  count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
