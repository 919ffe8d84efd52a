package graft.streaming

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The real streaming side: the same transforms StreamingPack verifies
  * in batch, executed through readStream -> watermark -> memory sink,
  * plus stateful operators (mapGroupsWithState, dropDuplicates
  * WithinWatermark) on a MemoryStream. */
class StreamingSpec extends SparkSpec {

  test("file-stream tumbling agg equals the batch answer (unified API)") {
    val dir = sf("sf0.001")
    val stream = EventStreams.streamFromParquet(spark, dir)
    val q = EventStreams.hourlyTypeCounts(stream, watermarked = true)
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hourly_stream")
      .select("window_start", "event_type", "cnt", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch =
      EventStreams.hourlyTypeCounts(Tables.events(spark, dir), watermarked = false)
        .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("mapGroupsWithState: per-user counts accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("user_id", "event_type")
    val q = EventStreams.runningUserCounts(spark, stream)
      .writeStream.format("memory").queryName("user_counts")
      .outputMode("update").start()
    try {
      input.addData((1L, "a"), (1L, "b"), (2L, "a"))
      q.processAllAvailable()
      input.addData((1L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    // update mode emits one row per key per batch; last write wins
    val last = spark.table("user_counts").groupBy("user_id")
      .agg(max("n_events").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(last == Map(1L -> 3L, 2L -> 1L), s"state did not accumulate: $last")
  }

  test("dropDuplicatesWithinWatermark suppresses duplicate event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val stream = input.toDF().toDF("event_id", "ts")
    val q = EventStreams.dedupedEvents(stream)
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    try {
      input.addData((1L, t0), (1L, t0), (2L, t0)) // dup within batch
      q.processAllAvailable()
      input.addData((2L, t0), (3L, t0)) // dup across batches
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("deduped").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
