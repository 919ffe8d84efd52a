package graft.queries

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Invariant tests for the corpus-curation operators added in round 3:
  * sequence packing (t_pack), stratified sampling (t_sample), and
  * metadata-filtered vector search (s_knn_filtered). The DuckDB oracle
  * pins exact values; these pin the semantic contracts a caller relies
  * on, on top of the hash compare. */
class CurationSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("t_pack conserves documents and tokens, packs in order") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = TextPack.queries("t_pack")(spark, dir)

    // every document lands in exactly one chunk; token mass conserved
    val (nDocs, nTokens) = {
      val r = docs.agg(count(lit(1)), sum(col("n_tokens"))).first()
      (r.getLong(0), r.getLong(1))
    }
    val p = packed.agg(sum(col("n_docs")), sum(col("n_tokens"))).first()
    assert(p.getLong(0) == nDocs)
    assert(p.getLong(1) == nTokens)

    // packing is ordered: within a source, chunk ids rise with doc ids
    // (first_doc of chunk k+1 > last_doc of chunk k), and chunk 0 exists
    import spark.implicits._
    val bad = packed.selectExpr("source", "chunk_id", "first_doc", "last_doc")
      .withColumn("prev_last",
        lag(col("last_doc"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("chunk_id"))))
      .filter(col("prev_last").isNotNull && col("first_doc") <= col("prev_last"))
    assert(bad.count() == 0)
    val firstChunks = packed.groupBy(col("source"))
      .agg(min(col("chunk_id")).as("c0")).filter($"c0" =!= 0L)
    assert(firstChunks.count() == 0)
  }

  test("t_sample quotas bind per language and are deterministic") {
    val out = TextPack.queries("t_sample")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lang, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(kept <= total, s"$lang kept > total")
      // quota is a bound on the hash bucket, so kept/total concentrates
      // near it; with ~100 docs/lang allow wide but one-sided slack
      val frac = kept.toDouble / total
      if (lang == "en") assert(frac < 0.5, s"en kept $frac, quota 0.2")
      else assert(frac > 0.5, s"$lang kept $frac, quota 0.8")
    }
    // content-hash assignment: identical on a second run
    val again = TextPack.queries("t_sample")(spark, dir).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("w5 max_by top-1 == w1 window top-1 (agg twin equivalence)") {
    val viaAgg = RelationalPack.queries("w5_top1_maxby")(spark, dir)
      .select(col("s_nationkey"), col("top_suppkey"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nat = Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val viaWindow = RelationalPack.topSupplierPerNation(spark, dir)
      .select(col("n_name").as("nm"), col("s_suppkey"))
      .join(nat, col("nm") === col("n_name"))
      .select(col("n_nationkey"), col("s_suppkey"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaAgg.nonEmpty)
    assert(viaAgg == viaWindow)
  }

  test("s_knn_filtered returns only same-label neighbors, k bounded") {
    val out = SimilarityPack.queries("s_knn_filtered")(spark, dir)
    val labels = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val q = labels.select(col("vec_id").as("qid"), col("label").as("ql"))
    val n = labels.select(col("vec_id").as("nid"), col("label").as("nl"))
    val joined = out.join(q, "qid").join(n, "nid")
    assert(joined.filter(col("ql") =!= col("nl")).count() == 0)
    val perQuery = out.groupBy(col("qid")).agg(count(lit(1)).as("k"))
    assert(perQuery.filter(col("k") > 5).count() == 0)
    // rank is dense from 1 within each query
    assert(out.filter(col("rk") < 1 || col("rk") > 5).count() == 0)
  }

  test("t_decontam excludes eval docs and flags exact eval copies") {
    val out = TextPack.queries("t_decontam")(spark, dir)
    // eval membership (doc_id % 10 = 0) never appears in the output
    assert(out.filter(col("doc_id") % 10 === 0).count() == 0)
    // overlap is bounded by the shingle count; basis points consistent
    assert(out.filter(col("n_overlap") > col("n_shingles")).count() == 0)
    assert(out.filter(col("overlap_bp") > 10000).count() == 0)
    // a train doc whose text is byte-identical to some eval doc has
    // full trigram overlap -> must be flagged (the exact-dup leak case
    // decontamination exists to catch)
    val docs = Tables(spark, dir, "documents")
    val evalTexts = docs.filter(col("doc_id") % 10 === 0)
      .select(col("text")).distinct()
    val leaked = docs.filter(col("doc_id") % 10 =!= 0)
      .join(evalTexts, Seq("text"), "left_semi")
      .select(col("doc_id"))
    val flagged = out.filter(col("contaminated")).select(col("doc_id"))
    assert(leaked.join(flagged, Seq("doc_id"), "left_anti").count() == 0,
      "an exact eval copy escaped the contamination flag")
  }

  test("t_vocab ids are dense ranks; freq floor holds") {
    val out = TextPack.queries("t_vocab")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(2)).toSeq == out.indices.map(_.toLong),
      "vocab ids not dense from 0")
    val freqs = out.map(_.getLong(1))
    assert(freqs.forall(_ >= 5))
    assert(freqs.sameElements(freqs.sorted(Ordering[Long].reverse)),
      "vocab not ordered by descending frequency")
  }

  test("t_mix emits per-source copies matching the weight schedule") {
    val out = TextPack.queries("t_mix")(spark, dir).collect()
    assert(out.nonEmpty)
    val baseCounts = Tables(spark, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (src, emitted, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      val n = baseCounts(src)
      src match {
        case "src0" | "src1" | "src2" => // weight 2.5: 2n..3n, all kept
          assert(emitted >= 2 * n && emitted <= 3 * n, s"$src emitted $emitted of $n")
          assert(kept == n)
        case "src3" | "src4" => // weight 0.5: at most n, a strict subset
          assert(emitted <= n && kept == emitted)
        case _ => // weight 1.0: identity
          assert(emitted == n && kept == n)
      }
    }
    // deterministic: content-hash assignment, not rand()
    val again = TextPack.queries("t_mix")(spark, dir).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("t_budget: each source stops at the crossing doc, deterministic") {
    val docs = Tables(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val maxDoc = docs.agg(max(col("n_tokens"))).first().getLong(0)
    val out = TextPack.queries("t_budget")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val kept = r.getLong(2)
      // the budget binds: never more than budget + one document, and
      // removing the crossing doc must leave the count under budget
      assert(kept < 2000L + maxDoc, s"${r.getString(0)} kept $kept tokens")
    }
    val again = TextPack.queries("t_budget")(spark, dir).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("t_pipeline census is a monotone funnel consistent with stages") {
    val r = TextPack.queries("t_pipeline")(spark, dir).first()
    val (nInput, nTrain, nQuality, nClean, nUnique, nFinal) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
    assert(nInput >= nTrain && nTrain >= nQuality && nQuality >= nClean &&
      nClean >= nUnique && nUnique >= nFinal,
      s"funnel not monotone: $nInput $nTrain $nQuality $nClean $nUnique $nFinal")
    assert(nFinal > 0 && r.getLong(6) > 0)
    // stage 1 must agree with the standalone quality operator's keeps
    // on the train slice (composition uses the same rule)
    val keeps = TextPack.queries("t_gopher_repetition")(spark, dir)
      .filter(col("keep") && col("doc_id") % 10 =!= 0).count()
    assert(nQuality == keeps)
  }

  test("t_lm_score covers every multi-word doc with a bounded score") {
    val out = TextPack.queries("t_lm_score")(spark, dir).collect()
    val docsWithBigram = Tables(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.length == docsWithBigram)
    out.foreach { r =>
      val (n, bp, keep) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(n >= 1)
      assert(bp >= 0 && bp <= 10000, s"score_bp $bp out of range")
      assert(keep == (bp >= 100))
    }
    // a doc made of the corpus's most common transitions must outscore
    // the overall minimum (the filter separates, not constant-scores)
    assert(out.map(_.getLong(2)).distinct.length > 1,
      "LM filter produced a constant score")
  }

  test("t_bigram_lm probabilities are consistent fractions") {
    val out = TextPack.queries("t_bigram_lm")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (c12, c1, bp) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(c12 <= c1, "bigram count exceeds its unigram denominator")
      assert(bp == c12 * 10000 / c1, "basis points not exact integer div")
      assert(bp <= 10000)
    }
  }

  test("t_redact scrubs every planted PII token and nothing else") {
    val out = TextPack.queries("t_redact")(spark, dir).collect()
    val nDocs = Tables(spark, dir, "documents").count()
    assert(out.length == nDocs)
    out.foreach { r =>
      assert(r.getLong(1) == 3, s"doc ${r.getLong(0)}: expected 3 PII hits")
      val red = r.getString(2)
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") &&
        red.contains("<IP>"))
      // nothing PII-shaped survives redaction
      assert(!red.contains("@"), s"unredacted email in: $red")
      assert(!red.exists(_.isDigit), s"unredacted digits in: $red")
    }
  }

  test("t_word_dedup keeps first occurrences in original order") {
    val out = TextPack.queries("t_word_dedup")(spark, dir).collect()
    val texts = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == texts.size)
    out.foreach { r =>
      val (id, nBefore, nAfter, dedup) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val orig = texts(id).split(" ")
      val expected = orig.distinct // Scala distinct = first-occurrence order
      assert(nBefore == orig.length)
      assert(nAfter == expected.length)
      assert(dedup == expected.mkString(" "),
        s"doc $id: dedup order diverged from first-occurrence order")
    }
  }
}
