package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.types.DecimalType

/** Pins the q1_agg exact-sum doctrine (sf100 tier catch, round 11):
  * price SUMs accumulate in DECIMAL so the total is ONE well-defined
  * value on any engine and any partial-aggregation tree, while the
  * OUTPUT stays decimal-free (the driver gate rejects decimal
  * columns). A regression back to double accumulation stays invisible
  * below ~600M rows — the value drift is ~4e-14 relative — so the
  * property is pinned structurally here, not by value at scale. */
class ExactSumSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q1_agg output carries no decimal column") {
    val out = graft.SparkEntry.queries("q1_agg")(spark, dir)
    assert(!out.schema.exists(_.dataType.isInstanceOf[DecimalType]),
      s"decimal column leaked into the gate output: ${out.schema}")
  }

  test("q1_agg price sums are the exact decimal totals") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q1_agg")(spark, dir)
      .select("l_returnflag", "l_linestatus", "sum_base_price").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // independent exact recomputation: per-row BigDecimal at 2dp,
    // summed on the driver (fixture-sized corpus) — associativity-free
    val rows = graft.io.Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .select("l_returnflag", "l_linestatus", "l_extendedprice").collect()
    val exact = rows.groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.map(r => BigDecimal(r.getDouble(2)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum).toMap
    exact.foreach { case (k, v) =>
      assert(out(k) == v.toDouble, s"group $k: got ${out(k)}, exact $v")
    }
  }

  test("decimal accumulation is partition-order invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // values engineered so double summation order visibly matters:
    // (1e16 + 0.04 + 0.04) == 1e16 in doubles left-to-right, but
    // 0.08 survives if the small terms combine first
    val vals = Seq(1.0e16, 0.04, 0.04)
    val sums = (1 to 4).map { n =>
      vals.toDF("v").repartition(n)
        .agg(sum($"v".cast("decimal(30,2)")).cast("double")).head.getDouble(0)
    }
    assert(sums.distinct.size == 1,
      s"decimal sum varied with partitioning: $sums")
    assert(sums.head == 1.000000000000000008e16)
  }
}
