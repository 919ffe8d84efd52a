package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one named query — the
  * plan-audit half of the perf workflow (TimeQuery is the timing
  * half). Usage: runMain graft.tools.ExplainQuery <sfDir> <name>... */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.io.Sessions.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.Top1WindowToMaxBy :+ graft.expr.CollapseAccentFold
    args.drop(1).foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      graft.scale.CacheRegistry.drain()
    }
    spark.stop()
  }
}
