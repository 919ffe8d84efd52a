package graft.scale

import graft.SparkSpec

import scala.util.Random

/** The Misra-Gries contract the g_heavy_hitters query rests on: after
  * distributed partial aggregation in ANY partitioning, every item
  * with true frequency > n/(k+1) is in the candidate set. Tested with
  * k far below the vocabulary (the corpus fixtures have fewer distinct
  * tokens than k, which would make the guarantee vacuous here). */
class MisraGriesSpec extends SparkSpec {

  private def checkGuarantee(seed: Int, k: Int, nItems: Int): Unit = {
    val rnd = new Random(seed)
    // Zipf-ish skew: item i drawn with weight ~ 1/(i+1)
    val vocab = (0 until 200).map(i => s"tok$i")
    val weights = vocab.indices.map(i => 1.0 / (i + 1))
    val wSum = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / wSum)
    val items = Seq.fill(nItems) {
      val r = rnd.nextDouble()
      vocab(cum.indexWhere(r <= _))
    }
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustSurvive = exact.filter(_._2 > nItems.toLong / (k + 1)).keySet

    import spark.implicits._
    val ds = spark.createDataset(items).repartition(7) // arbitrary split
    val cands = ds.select(MisraGries.sketch(k).toColumn).head().toSet
    assert(cands.size <= k, s"sketch kept ${cands.size} > k=$k counters")
    val missed = mustSurvive -- cands
    assert(missed.isEmpty,
      s"items above n/(k+1) missing from candidates: $missed")
  }

  test("MG candidates contain every item above n/(k+1), k << vocab") {
    checkGuarantee(seed = 1, k = 10, nItems = 5000)
    checkGuarantee(seed = 2, k = 25, nItems = 20000)
    checkGuarantee(seed = 3, k = 5, nItems = 1000)
  }
}
