package graft.tools

import graft.io.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase attribution for the fn_window_distinct shapes: naive 3-task
  * running window vs RunningSum (with/without input persist), plus the
  * shared upstream in isolation. Dev probe.
  * Usage: runMain graft.tools.FwdProbe <sfDir>
  */
object FwdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER lets the probe run under REAL multi-JVM
    // executors (spark-submit --master local-cluster[3,8,8192]) — the
    // r12 measurement of whether the naive form's 3 whole-corpus
    // window tasks serialize when they can no longer overlap inside
    // one JVM (SCALE.md "RunningSum", VERDICT r11 item 7).
    val spark = graft.io.Sessions.tuned(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def flagged = {
      val order = Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val firstSeen = Window.partitionBy(col("l_returnflag"), col("l_partkey"))
        .orderBy(order: _*)
      Tables(spark, sfDir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"),
          when(col("l_partkey").isNotNull &&
            row_number().over(firstSeen) === 1, 1L).otherwise(0L)
            .as("is_first"))
    }

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = mk.count()
      graft.scale.CacheRegistry.drain()
      println(f"[fwdprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }

    time("upstream_only")(flagged)
    val order = Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    time("naive_3task") {
      val running = Window.partitionBy(col("l_returnflag"))
        .orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      flagged.select(col("l_returnflag"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"),
        sum(col("is_first")).over(running).as("run_distinct"))
    }
    time("rs_nopersist") {
      graft.scale.RunningSum.withRunningSum(flagged, col("l_returnflag"),
        col("l_orderkey"), Seq(col("l_linenumber"), col("l_partkey")),
        col("is_first"), "run_distinct", persistInput = false)
    }
    time("rs_persist") {
      graft.scale.RunningSum.withRunningSum(flagged, col("l_returnflag"),
        col("l_orderkey"), Seq(col("l_linenumber"), col("l_partkey")),
        col("is_first"), "run_distinct", persistInput = true)
    }
    // the gate adds a global ORDER BY + one-file write on top; count()
    // lets EliminateSorts drop the sort, so time the sorted form via a
    // noop sink (full plan runs, no file I/O)
    def timeNoop(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      graft.scale.CacheRegistry.drain()
      println(f"[fwdprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timeNoop("naive_sorted_noop") {
      val running = Window.partitionBy(col("l_returnflag"))
        .orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      flagged.select(col("l_returnflag"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"),
        sum(col("is_first")).over(running).as("run_distinct"))
        .orderBy(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"))
    }
    timeNoop("rs_ride_sorted_noop") {
      graft.plans.RunningSumRide.withRunningSumSorted(spark, flagged,
        Seq(col("l_returnflag")), order, col("is_first"), "run_distinct")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("run_distinct"))
        .orderBy(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"))
    }
    timeNoop("rs_sorted_noop") {
      graft.scale.RunningSum.withRunningSum(flagged, col("l_returnflag"),
        col("l_orderkey"), Seq(col("l_linenumber"), col("l_partkey")),
        col("is_first"), "run_distinct", persistInput = false)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("run_distinct"))
        .orderBy(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"))
    }
    spark.stop()
  }
}
