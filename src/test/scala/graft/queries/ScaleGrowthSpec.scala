package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import graft.tools.SyntheticCorpus

/** Pins the scale story of the MinHash-LSH path with a measurement,
  * not an argument: banded candidate pairs must grow like the planted
  * duplicates (linearly), NOT like the pair space (quadratically).
  * 1k -> 4k docs quadruples the corpus; all-pairs would grow 16x.
  * The generator plants ~5% near-dups at every size, so the expected
  * candidate growth is ~4x (plus a handful of same-base birthday
  * collisions); anything at or past ~half the quadratic ratio means
  * the banding has degenerated into broad buckets.
  */
class ScaleGrowthSpec extends SparkSpec {

  test("MinHash banded candidates grow sub-quadratically, 1k -> 4k docs") {
    def corpus(n: Long): String = {
      val dir = Files.createTempDirectory(s"graft_growth_$n").toString
      SyntheticCorpus.documents(spark, sf("sf0.01"), n, seed = 7L)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val c1 = DedupPack.bandedCandidates(spark, corpus(1000)).count()
    val c4 = DedupPack.bandedCandidates(spark, corpus(4000)).count()
    assert(c1 > 20, s"generator must plant enough dups to measure (got $c1)")
    val ratio = c4.toDouble / c1
    assert(ratio < 8.0,
      f"candidate growth $ratio%.1fx at 4x data — quadratic is 16x, " +
        "linear (planted dups) is ~4x; banding has degenerated")
  }
}
