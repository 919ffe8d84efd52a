package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The top-1 window→max_by optimizer rule: fires on the canonical
  * pattern (results unchanged, Window gone from the plan), declines
  * every pattern it cannot prove safe, and keeps whole rows
  * consistent. SparkSpec registers the rule via extraOptimizations,
  * so every `row_number + rk=1` query in the suite runs through it —
  * including w1's oracle query. */
class Top1WindowToMaxBySpec extends SparkSpec {

  import spark.implicits._

  private def skewed: DataFrame = Seq(
    (1L, 10L, 5.0), (1L, 20L, 7.0), (1L, 30L, 7.0),
    (2L, 40L, 1.0), (3L, 50L, 2.0), (3L, 60L, 3.0))
    .toDF("grp", "id", "score")

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  test("fires on row_number + rk = 1; answer matches, Window gone") {
    val w = Window.partitionBy($"grp").orderBy($"id".desc)
    val df = skewed.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
    assert(!hasWindow(df), "window survived the rewrite")
    val rows = df.select("grp", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 30L, 2L -> 40L, 3L -> 60L))
  }

  test("whole row is consistent (no tearing across columns)") {
    // top by id asc: the winning row's score must accompany its id
    val w = Window.partitionBy($"grp").orderBy($"id".asc)
    val df = skewed.withColumn("rk", row_number().over(w)).filter($"rk" <= 1)
    assert(!hasWindow(df))
    val rows = df.select("grp", "id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 10L, 5.0), (2L, 40L, 1.0), (3L, 50L, 2.0)))
  }

  test("mixed-direction multi-key order matches the window answer") {
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id".asc)
    def run(rule: Boolean): Map[Long, Long] = {
      val base = Seq(
        (1L, 10L, 5L), (1L, 20L, 7L), (1L, 30L, 7L),
        (2L, 40L, 1L), (3L, 50L, 2L), (3L, 60L, 2L))
        .toDF("grp", "id", "score")
      val df = base.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      df.select("grp", "id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // score desc, id asc: grp 1 -> id 20 (score 7 tie, lower id wins)
    assert(run(rule = true) == Map(1L -> 20L, 2L -> 40L, 3L -> 50L))
  }

  test("nullable keys follow NULLS FIRST/LAST exactly") {
    val data = Seq((1L, Option(10L)), (1L, None), (1L, Option(5L)),
      (2L, Option(1L))).toDF("grp", "k")
    // asc → NULLS FIRST by default: the null row ranks 1
    val wAsc = Window.partitionBy($"grp").orderBy($"k".asc)
    val ascTop = data.withColumn("rk", row_number().over(wAsc))
      .filter($"rk" === 1).select("grp", "k").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(ascTop == Map(1L -> None, 2L -> Some(1L)))
    // desc → NULLS LAST by default: the null row ranks last
    val wDesc = Window.partitionBy($"grp").orderBy($"k".desc)
    val descDf = data.withColumn("rk", row_number().over(wDesc)).filter($"rk" === 1)
    assert(!hasWindow(descDf))
    val descTop = descDf.select("grp", "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(descTop == Map(1L -> 10L, 2L -> 1L))
  }

  test("extra filter conjuncts survive above the aggregate") {
    val w = Window.partitionBy($"grp").orderBy($"id".desc)
    val df = skewed.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1 && $"score" > 1.5)
    assert(!hasWindow(df))
    val rows = df.select("grp", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 30L, 3L -> 60L)) // grp 2 (score 1.0) filtered
  }

  test("declines: rank(), rk = 2, k <= 10, non-integral keys") {
    val wS = Window.partitionBy($"grp").orderBy($"score".desc) // double key
    val d1 = skewed.withColumn("rk", row_number().over(wS)).filter($"rk" === 1)
    assert(hasWindow(d1), "must not fire on a double sort key")

    val w = Window.partitionBy($"grp").orderBy($"id".desc)
    val d2 = skewed.withColumn("rk", rank().over(w)).filter($"rk" === 1)
    assert(hasWindow(d2), "must not fire on rank()")

    val d3 = skewed.withColumn("rk", row_number().over(w)).filter($"rk" === 2)
    assert(hasWindow(d3), "must not fire on rk = 2")

    val d4 = skewed.withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
    assert(hasWindow(d4), "must not fire on top-k > 1")
  }

  test("property: rewritten top-1 == in-memory reference on random data") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 8) {
      val n = 20 + rnd.nextInt(200)
      val rows = Seq.fill(n)((rnd.nextInt(6).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(15).toLong))
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        // score desc, id asc — mirror the window order exactly
        g -> rs.minBy(r => (-r._3, r._2))._2
      }
      val df = rows.toDF("grp", "id", "score")
      val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id".asc)
      val out = df.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      assert(!hasWindow(out), s"trial $trial: rule did not fire")
      val got = out.select("grp", "id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial differs: $got vs $expected")
    }
  }

  test("w1's production query goes through the rewrite and agrees") {
    val dir = sf("sf0.001")
    val viaRule = graft.queries.RelationalPack
      .topSupplierPerNation(spark, dir)
    assert(!hasWindow(viaRule), "w1 should rewrite to max_by")
    val viaAgg = graft.queries.RelationalPack
      .queries("w5_top1_maxby")(spark, dir)
      .select(col("top_suppkey")).collect().map(_.getLong(0)).toSet
    val w1Keys = viaRule.select(col("s_suppkey")).collect()
      .map(_.getLong(0)).toSet
    assert(w1Keys == viaAgg)
  }
}
