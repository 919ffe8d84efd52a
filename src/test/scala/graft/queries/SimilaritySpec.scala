package graft.queries

import graft.SparkSpec
import graft.SparkEntry

class SimilaritySpec extends SparkSpec {

  test("sign-LSH ANN achieves recall >= 0.5 vs brute force (sf0.001)") {
    val dir = sf("sf0.001")
    def topk(q: String): Map[Long, Set[Long]] = SparkEntry.queries(q)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = topk("s_knn_brute")
    val lsh = topk("s_knn_lsh")
    assert(brute.nonEmpty)
    val recalls = brute.map { case (q, nbrs) =>
      lsh.getOrElse(q, Set.empty).intersect(nbrs).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    // random gaussian corpus with no planted neighbors is the hardest
    // case for LSH; 12-bit x 3 tables is tuned for speed not recall —
    // this guards against the candidate generation silently breaking.
    assert(mean >= 0.5, s"mean recall@10 degraded: $mean")
  }

  test("every LSH result pair is a true-cosine pair (no fabricated rows)") {
    val dir = sf("sf0.001")
    val brute = SparkEntry.queries("s_knn_brute")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = SparkEntry.queries("s_knn_lsh")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // cosines reported by the ANN path must match the exact path where
    // the pair is in both top-10 sets
    lsh.foreach { case (pair, cos) =>
      brute.get(pair).foreach(exact => assert(math.abs(exact - cos) < 1e-9))
    }
  }
}
