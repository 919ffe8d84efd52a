package graft.queries

import graft.SparkSpec
import graft.SparkEntry

class DedupSpec extends SparkSpec {

  test("minhash-LSH and simhash outputs equal exact n-gram Jaccard (sf0.001)") {
    val dir = sf("sf0.001")
    def rows(q: String) = SparkEntry.queries(q)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows("d_ngram_jaccard")
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(rows("d_minhash_lsh") == exact, "minhash recall/precision != exact")
    assert(rows("d_simhash") == exact, "simhash recall/precision != exact")
  }

  test("exact dedup keeps lowest id and counts planted copies") {
    val out = SparkEntry.queries("d_exact")(spark, sf("sf0.001")).collect()
    // 500 docs, even ids planted once more -> 250 groups of 2, 250 of 1
    assert(out.length == 500)
    assert(out.count(_.getLong(1) == 2L) == 250)
    assert(out.forall(r => r.getLong(0) < 100000)) // kept id is the original
  }
}
