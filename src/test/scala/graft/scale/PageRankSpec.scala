package graft.scale

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  /** Undirected helper: symmetrizes, runs k rounds, returns node->rank. */
  private def pr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    val sym = edges ++ edges.map(_.swap)
    PageRank.run(sym.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** In-memory reference of the exact integer recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(_.swap)).distinct
    val od = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var rank = od.keys.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      sym.foreach { case (s, d) => acc(d) += rank(s) / od(s) }
      rank = acc.map { case (n, a) => n -> (150000L + (850L * a) / 1000L) }.toMap
    }
    rank
  }

  test("matches the in-memory integer recurrence on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(80)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    assert(pr(edges, 5) == reference(edges, 5))
  }

  test("star hub outranks every leaf") {
    val star = (1L to 8L).map(i => (0L, i))
    val got = pr(star, 5)
    val hub = got(0L)
    (1L to 8L).foreach(i => assert(got(i) < hub,
      s"leaf $i rank ${got(i)} >= hub rank $hub"))
    // leaves are symmetric — identical rank
    assert((1L to 8L).map(got).distinct.size == 1)
  }

  test("ranks stay within the mass bounds of the damped update") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(50)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val got = pr(edges, 5)
    // every rank >= the teleport floor; truncation only bleeds mass
    // downward, so the total never exceeds n * 1e6
    got.values.foreach(r => assert(r >= 150000L))
    assert(got.values.sum <= got.size * 1000000L)
  }

  test("duplicate edges collapse (multi-edges carry no extra weight)") {
    val once = pr(Seq((1L, 2L), (2L, 3L)), 3)
    val dup = pr(Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L)), 3)
    assert(once == dup)
  }
}
