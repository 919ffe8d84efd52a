package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Durable streaming state: a windowless running aggregation must
  * survive a query restart from its checkpoint — the property that
  * makes long-lived 100 TB streaming jobs operable. Uses the file
  * source (replayable, unlike MemoryStream) so the restarted query can
  * recover committed offsets. */
class CheckpointSpec extends SparkSpec {

  test("aggregation state survives stop + restart from checkpoint") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val srcDir = s"$base/src"
    val ckpt = s"$base/checkpoint"
    new java.io.File(srcDir).mkdirs()

    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("user_id", "event_type").write.mode("append")
        .parquet(s"$srcDir/$name")

    def startQuery() = spark.readStream
      .schema("user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", "100")
      .parquet(s"$srcDir/*")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ckpt_counts")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    writeBatch("b1", Seq((1L, "a"), (1L, "b"), (2L, "a")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val afterFirst = spark.table("ckpt_counts")
      .as[(Long, Long)].collect().toMap
    assert(afterFirst == Map(1L -> 2L, 2L -> 1L))

    // new files land while the query is DOWN; restart must pick them
    // up on top of recovered state
    writeBatch("b2", Seq((1L, "c"), (3L, "a")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val afterRestart = spark.table("ckpt_counts")
      .as[(Long, Long)].collect().toMap
    assert(afterRestart == Map(1L -> 3L, 2L -> 1L, 3L -> 1L),
      s"state not recovered: $afterRestart")
  }
}
