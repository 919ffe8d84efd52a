package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.DataFrame

class SimilaritySpec extends SparkSpec {

  private def topk(df: DataFrame): Map[Long, Set[Long]] = df
    .collect().map(r => (r.getLong(0), r.getLong(1)))
    .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("sign-LSH ANN achieves recall >= 0.5 vs brute force (sf0.001)") {
    val e = SimilarityPack.vecs(spark, sf("sf0.001"))
    val brute = topk(SimilarityPack.bruteTopK(e))
    val lsh = topk(SimilarityPack.knnLshTopK(e))
    assert(brute.nonEmpty)
    val recalls = brute.map { case (q, nbrs) =>
      lsh.getOrElse(q, Set.empty).intersect(nbrs).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    // random gaussian corpus with no planted neighbors is the hardest
    // case for LSH; 4-bit x 8 tables is tuned for speed not recall —
    // this guards against the candidate generation silently breaking.
    assert(mean >= 0.5, s"mean recall@10 degraded: $mean")
  }

  test("every LSH result pair is a true-cosine pair (no fabricated rows)") {
    val e = SimilarityPack.vecs(spark, sf("sf0.001"))
    val brute = SimilarityPack.bruteTopK(e)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = SimilarityPack.knnLshTopK(e)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // cosines reported by the ANN path must match the exact path where
    // the pair is in both top-10 sets
    lsh.foreach { case (pair, cos) =>
      brute.get(pair).foreach(exact => assert(math.abs(exact - cos) < 1e-9))
    }
  }

  test("IVF ANN achieves recall >= 0.5 vs brute force (sf0.001)") {
    val e = SimilarityPack.vecs(spark, sf("sf0.001"))
    val brute = topk(SimilarityPack.bruteTopK(e))
    val ivf = topk(SimilarityPack.knnIvfTopK(e))
    assert(brute.nonEmpty)
    val recalls = brute.map { case (q, nbrs) =>
      ivf.getOrElse(q, Set.empty).intersect(nbrs).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF mean recall@10 = $mean%.3f")
    assert(mean >= 0.5, s"IVF mean recall@10 degraded: $mean")
  }

  test("s_knn_ivf invariant row reports recall_ok (sf0.001)") {
    val rows = SparkEntry.queries("s_knn_ivf")(spark, sf("sf0.001")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_queries") == 10L)
    assert(rows.head.getAs[Boolean]("recall_ok"))
  }

  test("s_knn_lsh invariant row reports recall_ok (sf0.001)") {
    val rows = SparkEntry.queries("s_knn_lsh")(spark, sf("sf0.001")).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_queries") == 10L)
    assert(r.getAs[Boolean]("recall_ok"), "mean recall@10 fell below 0.5")
  }

  test("PQ ANN achieves recall >= 0.5 vs brute force (sf0.001)") {
    val e = SimilarityPack.vecs(spark, sf("sf0.001"))
    val brute = topk(SimilarityPack.bruteTopK(e))
    val pq = topk(SimilarityPack.knnPqTopK(e))
    assert(brute.nonEmpty)
    val recalls = brute.map { case (q, nbrs) =>
      pq.getOrElse(q, Set.empty).intersect(nbrs).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ mean recall@10 = $mean%.3f")
    assert(mean >= 0.5, s"PQ mean recall@10 degraded: $mean")
    // every PQ result is a true-cosine top candidate (re-ranked
    // exactly), so cos values must match brute's for shared pairs —
    // guarded implicitly by topk() comparing (qid, nid) sets
  }
}
