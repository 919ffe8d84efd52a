package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RunningSum must equal the direct running-window sum on ANY input —
  * splitters are load-balance only. Pinned against the naive form on
  * adversarial shapes (duplicate order keys straddling splitters, null
  * partition values, empty input) and on real lineitem data, plus the
  * plan-level property the helper exists for: the window is
  * partitioned by (partition, chunk), never by the 3-value partition
  * column alone. */
class RunningSumSpec extends SparkSpec {

  import spark.implicits._

  private def direct(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy($"p").orderBy($"k", $"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("want", sum($"x").over(w))
  }

  private def check(rows: Seq[(String, Long, Long, Long)]): Unit = {
    val df = rows.toDF("p", "k", "t", "x").repartition(7)
    val got = RunningSum.withRunningSum(df, $"p", $"k", Seq($"t"), $"x",
        "got", nChunks = 4)
      .withColumnsRenamed(Map("p" -> "p2", "k" -> "k2", "t" -> "t2"))
      .drop("x")
    // null-safe join key: a USING join would silently drop null-p rows
    val joined = direct(df).join(got,
      $"p" <=> $"p2" && $"k" === $"k2" && $"t" === $"t2")
    assert(joined.count() == rows.size)
    val bad = joined.filter($"want" =!= $"got")
    assert(bad.isEmpty, s"mismatch: ${bad.take(5).mkString(", ")}")
  }

  test("matches the direct window on dense duplicate order keys") {
    // many ties per order key so chunk boundaries MUST respect the
    // total order (ties of one key never split across chunks)
    val rows = for {
      p <- Seq("A", "B", "C"); k <- 1L to 40L; t <- 1L to 3L
    } yield (p, k, t, (k + t) % 3)
    check(rows)
  }

  test("matches on skewed partitions and a null partition value") {
    val rows = (1L to 300L).map(i => ("A", i % 17, i, i % 2)) ++
      Seq(("B", 1L, 1L, 5L), (null.asInstanceOf[String], 2L, 1L, 7L),
        (null.asInstanceOf[String], 3L, 2L, 1L))
    check(rows)
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(String, Long, Long, Long)].toDF("p", "k", "t", "x")
    assert(RunningSum.withRunningSum(df, $"p", $"k", Seq($"t"), $"x",
      "got", nChunks = 4).isEmpty)
  }

  test("RunningSum is a drop-in twin of the gated fn_window_distinct") {
    // the cluster-scale escape hatch must stay value-identical to the
    // gated 3-task window form on real lineitem data
    val dir = sf("sf0.001")
    val li = graft.io.Tables(spark, dir, "lineitem")
    val order = Seq($"l_orderkey", $"l_linenumber", $"l_partkey")
    val firstSeen = Window.partitionBy($"l_returnflag", $"l_partkey")
      .orderBy(order: _*)
    val flagged = li.select($"l_returnflag", $"l_orderkey", $"l_linenumber",
      $"l_partkey",
      when($"l_partkey".isNotNull &&
        row_number().over(firstSeen) === 1, 1L).otherwise(0L)
        .as("is_first"))
    val twin = RunningSum.withRunningSum(flagged, $"l_returnflag",
      $"l_orderkey", Seq($"l_linenumber", $"l_partkey"), $"is_first",
      "want", nChunks = 8)
    val got = graft.SparkEntry.queries("fn_window_distinct")(spark, dir)
    val bad = twin.join(got,
        Seq("l_returnflag", "l_orderkey", "l_linenumber", "l_partkey"))
      .filter($"want" =!= $"run_distinct")
    assert(twin.count() == got.count())
    assert(bad.isEmpty, s"mismatch: ${bad.take(3).mkString(", ")}")
  }

  test("the helper's running window is chunk-partitioned, not |p|-task") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("A", i, i, 1L)).toDF("p", "k", "t", "x")
    val out = RunningSum.withRunningSum(df, $"p", $"k", Seq($"t"), $"x",
      "got", nChunks = 4)
    val winSpecs = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.sql).mkString(",")
    }
    assert(winSpecs.exists(_.contains("__rs_chunk")),
      s"running-sum window lost its chunk partitioning: $winSpecs")
  }
}
