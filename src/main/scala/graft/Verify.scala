package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev only; the driver passes 2): comma-separated
    // query names — dump just those for fast oracle iteration
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle partitioning is a DEPLOYMENT knob sized to the data
    // tier, not operator semantics: #cpus is right up to ~sf10, but
    // the sf100 tier's 600M-row distinct needs partitions that fit in
    // one task's aggregation memory (r12 catch: g_sssp_hops died with
    // AGGREGATE_OUT_OF_MEMORY at 32 partitions x 600M rows; 256 runs
    // it). A real cluster sets this to its executor-core count.
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // SPARK_GRAFT_MASTER lets the WHOLE gate run under real multi-JVM
    // executors (spark-submit --master local-cluster[3,8,8192]) — the
    // only local tier where executor-boundary serialization bugs
    // (the r3 trainingSummary NotSerializable class) can fire.
    val spark = graft.io.Sessions.tuned(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark only reads
      // as long (nanos since epoch); Tables.events converts back.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // State-store backend switch (VERDICT r10 item 4): with
    // SPARK_GRAFT_STATE_STORE=rocksdb every stream-exec row runs its
    // StreamExecution on the RocksDB provider (the 100 TB deployment
    // backend) — the gate's oracle compare then proves the rows are
    // provider-invariant at tier-sized state. streamSession propagates
    // this conf into each cloned stream session.
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").exists(_.equalsIgnoreCase("rocksdb")))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // production-path optimizer rules (w1's window top-1 rewrites to
    // max_by and must STILL hash-match the DuckDB oracle)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.Top1WindowToMaxBy :+ graft.expr.CollapseAccentFold
    new java.io.File(outDir).mkdirs()
    // Run query dumps on a small thread pool: Spark's scheduler is
    // thread-safe and most queries leave cores idle between stages, so
    // 4-way overlap roughly halves wall-clock without oversubscribing
    // the executor threads. Each query writes its own directory — no
    // shared state beyond the session.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // A failed dump must NOT just shrink the gate: record every failure
    // in the out dir (per-query _FAILED.txt marker inside the query's
    // dir so directory-globbing consumers see an err row instead of an
    // absent one, plus an _errors.json summary with the expected query
    // count so selfcheck can assert #dumps + #errors == #queries).
    // Round 4 shipped "152/152 green" while 8 queries silently crashed.
    val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val futures = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        // label per query (thread-local, so the concurrent dumps stay
        // correctly attributed) — read by MemoPool's payer= log line
        spark.sparkContext.setJobDescription(name)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[verify] $name FAILED: $msg")
          errors.put(name, msg)
          try {
            val d = new java.io.File(s"$outDir/$name")
            d.mkdirs()
            Files.writeString(Paths.get(s"$outDir/$name/_FAILED.txt"), msg)
          } catch { case _: Throwable => () }
        }
        // builder + write share this pool thread: releases exactly
        // this query's tracked persists (graph ops), nobody else's
        finally graft.scale.CacheRegistry.drain()
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Always written (even when empty) so its ABSENCE is also a signal
    // that Verify died before finishing the dump loop.
    import scala.jdk.CollectionConverters._
    val errJson = errors.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{\"expected\": " +
        only.map(f => SparkEntry.queries.keySet.count(f.contains))
          .getOrElse(SparkEntry.queries.size) +
        ", \"errors\": {", ",", "}}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (!errors.isEmpty)
      System.err.println(
        s"[verify] ${errors.size}/${SparkEntry.queries.size} queries FAILED: " +
          errors.keySet.asScala.toSeq.sorted.mkString(", "))
    spark.stop()
  }
}
