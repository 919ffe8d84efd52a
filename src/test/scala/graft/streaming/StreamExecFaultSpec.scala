package graft.streaming

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** The st_dedup_stream_exec gate row proves streaming dedup lands back
  * on the clean census — this spec proves the FAULTS IT REMOVES ARE
  * REAL: the staged stream dir genuinely over-counts the original
  * events (re-sends + replays), so the gated equality is not vacuous.
  */
class StreamExecFaultSpec extends SparkSpec {

  test("dedup staging injects real at-least-once faults") {
    val dir = sf("sf0.001")
    val staged = StreamExec.dedupStagedDir(spark, dir)
    val stagedRows = spark.read.parquet(staged.toString)
    val clean = Tables.events(spark, dir)
    val nStaged = stagedRows.count()
    val nClean = clean.count()
    assert(nStaged > nClean,
      s"staging must over-count: staged=$nStaged clean=$nClean")
    // the duplicates are exact replays: distinct event_ids still match
    assert(stagedRows.select(col("event_id")).distinct().count() === nClean)
  }

  test("dedupViaStream reconstructs the clean census exactly") {
    val dir = sf("sf0.001")
    val streamed = StreamExec.dedupViaStream(spark, dir).collect()
    val batch = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("id_sum"))
      .orderBy(col("event_type"))
      .collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stream-stream join state is evicted by the watermark") {
    // Spark logs a per-conjunct "Error trying to extract state
    // constraint" WARN for the non-temporal event_id term of the join
    // condition; this pins that the OVERALL time-range constraint is
    // still derived and join state is genuinely removed — without
    // eviction, state on a real stream grows without bound.
    import org.apache.spark.sql.streaming.Trigger
    val dir = StreamExec.dedupStagedDir(spark, sf("sf0.001")).toString
    def src() = {
      val physical = spark.read.parquet(dir).schema
      graft.io.Tables.normalizeEventTs(
        spark.readStream.schema(physical)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet").parquet(dir))
    }
    val q = EventStreams.correlatedPairs(src(), src())
      .writeStream.format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    val finalTotal = q.recentProgress.lastOption
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    assert(removed > 0, "watermark never evicted join state")
    assert(finalTotal < 100,
      s"join state not drained at end of stream: $finalTotal rows")
  }

  test("joinViaStream equals the batch stream-stream twin") {
    val dir = sf("sf0.001")
    val streamed = StreamExec.joinViaStream(spark, dir).collect()
    val ev = Tables.events(spark, dir)
    val l = ev.select(col("user_id"), col("event_id").as("eid_a"),
      col("ts").as("ts_a"))
    val r = ev.select(col("user_id").as("u2"), col("event_id").as("eid_b"),
      col("ts").as("ts_b"))
    val batch = l.join(r, col("user_id") === col("u2") &&
        col("ts_b").between(col("ts_a"),
          col("ts_a") + expr("INTERVAL 10 MINUTES")) &&
        col("eid_a") < col("eid_b"))
      .select(col("user_id"), col("eid_a"), col("eid_b"))
      .orderBy(col("eid_a"), col("eid_b"))
      .collect()
    assert(streamed.toSeq === batch.toSeq)
  }
}
