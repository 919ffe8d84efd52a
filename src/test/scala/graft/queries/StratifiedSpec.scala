package graft.queries

import graft.SparkSpec

/** Pins the largest-remainder allocation laws t_stratified's oracle
  * equality alone would not localize: the budget is met EXACTLY, no
  * stratum deviates from its proportional share by a full unit, and
  * every stratum fills its quota. */
class StratifiedSpec extends SparkSpec {

  private def rows(dir: String) =
    TextPack.queries("t_stratified")(spark, sf(dir)).collect()

  test("quotas sum exactly to the budget and selection fills them") {
    for (d <- Seq("sf0.001", "sf0.01")) {
      val r = rows(d)
      val quotas = r.map(_.getAs[Long]("quota"))
      assert(quotas.sum == 200L, s"$d: quotas ${quotas.toSeq} != 200")
      r.foreach { row =>
        assert(row.getAs[Long]("n_sel") == row.getAs[Long]("quota"),
          s"$d: stratum ${row.get(0)} under-filled")
      }
    }
  }

  test("no stratum deviates a full unit from its proportional share") {
    val r = rows("sf0.01")
    val tot = r.map(_.getAs[Long]("n_total")).sum
    r.foreach { row =>
      val exact = 200.0 * row.getAs[Long]("n_total") / tot
      val q = row.getAs[Long]("quota")
      assert(q >= math.floor(exact) && q <= math.floor(exact) + 1,
        s"stratum ${row.get(0)}: quota $q vs share $exact")
    }
  }
}
