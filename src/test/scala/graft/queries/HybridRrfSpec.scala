package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the point of hybrid retrieval: reciprocal-rank fusion finds
  * the planted relevant item that NEITHER single ranker puts first.
  *
  * Fixture geometry (2-d, one query q = (1, 0)):
  *  - `x` points exactly along q but is tiny: cosine rank 1, inner
  *    product far down (magnitude ~0) — a "keyword-exact but thin"
  *    result;
  *  - `y` is huge but nearly orthogonal: inner-product rank 1, cosine
  *    far down — a "popular but off-topic" result;
  *  - `t` (the planted relevant item) is rank 2 on BOTH signals;
  *  - fillers are mediocre on both.
  * RRF(k=60): t scores 2/62 while x and y each get 1/61 + a term from
  * rank >= 5 (1/61 + 1/65 < 2/62) — fusion elects t, the single
  * rankers elect x and y.
  */
class HybridRrfSpec extends SparkSpec {

  test("RRF fusion beats either ranker alone on the planted fixture") {
    import spark.implicits._
    val corpus = Seq(
      (100L, Array(0.01, 0.0)),   // x: cos rank 1, ip rank ~6
      (101L, Array(3.0, 17.0)),   // y: ip rank 1, cos rank ~6
      (102L, Array(2.0, 0.6)),    // t: rank 2 on both
      (103L, Array(0.05, 0.20)),
      (104L, Array(0.05, 0.21)),
      (105L, Array(0.05, 0.22))
    ).toDF("vec_id", "v")
    val q = Seq((1L, Array(1.0, 0.0))).toDF("qid", "qv")
    val dot = graft.expr.DotProduct(col("qv"), col("v"))
    val pairs = q.crossJoin(corpus)
      .select(col("qid"), col("vec_id").as("nid"),
        (dot / (sqrt(graft.expr.DotProduct(col("qv"), col("qv"))) *
          sqrt(graft.expr.DotProduct(col("v"), col("v"))))).as("cos"),
        dot.as("ip"))

    def top1By(c: String): Long = pairs
      .orderBy(col(c).desc, col("nid").asc).select(col("nid"))
      .head().getLong(0)

    assert(top1By("cos") == 100L) // cosine alone: the thin exact match
    assert(top1By("ip") == 101L)  // MIPS alone: the off-topic giant

    val fused = SimilarityPack.rrfFuse(pairs)
      .filter(col("rk") === 1).select(col("nid")).head().getLong(0)
    assert(fused == 102L, "fusion must elect the planted item")
  }

  test("fused scores are integer-exact and truncated at rank 10") {
    import spark.implicits._
    // 12 corpus items, strictly decreasing on both signals in the
    // same order: item i rotates away from q (cosine falls) AND
    // shrinks (inner product falls faster), so cos-rank = ip-rank =
    // i+1 with gaps far above float ulps. Items past rank 10 must
    // contribute nothing and the top-10 scores must be exactly
    // 2 * (RrfScale div (60 + rank)).
    val corpus = (0 until 12).map { i =>
      val m = 1.0 / (1 + i)
      (200L + i, Array(m * math.cos(0.1 * i), m * math.sin(0.1 * i)))
    }
    val q = Seq((1L, Array(1.0, 0.0))).toDF("qid", "qv")
    val dot = graft.expr.DotProduct(col("qv"), col("v"))
    val pairs = q.crossJoin(corpus.toDF("vec_id", "v"))
      .select(col("qid"), col("vec_id").as("nid"),
        (dot / (sqrt(graft.expr.DotProduct(col("qv"), col("qv"))) *
          sqrt(graft.expr.DotProduct(col("v"), col("v"))))).as("cos"),
        dot.as("ip"))
    val got = SimilarityPack.rrfFuse(pairs)
      .select(col("nid"), col("rrf_scaled"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val L = 142813628717760L
    val want = (1 to 10).map(rk => (200L + rk - 1, 2 * (L / (60 + rk)), rk))
    assert(got.sortBy(_._3) == want)
  }
}
