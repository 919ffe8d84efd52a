package graft.queries

import graft.{PlanWalk, SparkSpec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The ly_bucketed_join gate row proves VALUE fidelity through the
  * bucketed write→read cycle; this spec pins the layout's reason to
  * exist — the join on the bucket key plans with ZERO ShuffleExchange,
  * because both sides arrive pre-partitioned by hash(custkey) % 8
  * from the file layout. At 100 TB this is the difference between
  * paying the fact-table shuffle on EVERY join and paying it once at
  * write time; if a Spark upgrade or conf change silently re-plans
  * the exchange, the layout is dead weight and this spec turns red.
  */
class BucketedJoinSpec extends SparkSpec {

  private def shuffles(p: SparkPlan): Seq[SparkPlan] =
    PlanWalk.collect(p) { case e: ShuffleExchangeExec => e }

  test("bucketed join on the bucket key plans with zero ShuffleExchange") {
    val dir = sf("sf0.001")
    val (to, tc) = LayoutPack.bucketedOrdersCustomer(spark, dir)
    // broadcast off: a broadcast join would ALSO be exchange-free but
    // proves nothing about the layout — force the sort-merge path a
    // 100 TB fact⨝fact join would take
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table(to)
        .join(spark.table(tc), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"))
      j.collect() // materialize so AQE finalizes the plan
      val sh = shuffles(j.queryExecution.executedPlan)
      assert(sh.isEmpty,
        s"bucketed join planned ${sh.size} ShuffleExchange(s):\n" +
          j.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bucketed round-trip preserves orders row-for-row") {
    val dir = sf("sf0.001")
    val (to, _) = LayoutPack.bucketedOrdersCustomer(spark, dir)
    val orig = graft.io.Tables(spark, dir, "orders")
    val back = spark.table(to)
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }
}
