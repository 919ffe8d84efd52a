package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Explicit pre-shuffle Bloom pruning (scale/BloomJoin) — the
  * always-on, statistics-independent twin of the runtime filter
  * exercised by [[BloomFilterJoinSpec]]. */
class BloomJoinSpec extends SparkSpec {

  test("pruned join output equals the plain join (no false negatives)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // probe keys span 0..999; build keys cover only a sparse subset
    val probe = Seq.fill(5000)((rnd.nextInt(1000).toLong, rnd.nextInt(100)))
      .toDF("k", "payload")
    val build = (0L until 1000L by 13L).map(k => (k, s"b$k")).toDF("bk", "tag")
    val plain = probe.join(build, $"k" === $"bk")
      .groupBy($"k").agg(count(lit(1)).as("n"), first($"tag").as("tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val pruned = BloomJoin.prune(probe, $"k", build, $"bk")
      .join(build, $"k" === $"bk")
      .groupBy($"k").agg(count(lit(1)).as("n"), first($"tag").as("tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(pruned == plain)
  }

  test("prune actually discards non-joinable probe rows") {
    import spark.implicits._
    // disjoint key ranges: every probe row is non-matching; anything
    // surviving is a bloom false positive, bounded well under 1%
    val probe = (100000L to 110000L).map(k => (k, k % 7)).toDF("k", "p")
    val build = (0L to 1000L).map(k => (k, k)).toDF("bk", "b")
    val kept = BloomJoin.prune(probe, $"k", build, $"bk").count()
    assert(kept < probe.count() / 100,
      s"bloom kept $kept of 10001 non-matching rows")
  }

  test("prune composes with Structured Streaming (stream-static)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val build = (0L to 100L by 10L).map(Tuple1(_)).toDF("bk")
    val pruned = BloomJoin.prune(
      input.toDF().toDF("k", "payload"), $"k", build, $"bk")
    val q = pruned.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").start()
    try {
      input.addData((10L, "hit"), (11L, "miss"), (20L, "hit"), (999L, "miss"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("bloom_stream").select($"k")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(10L) && kept.contains(20L),
      s"matching keys must survive: $kept")
    // non-members pruned modulo bloom FPs — with 1 Mi bits over 11
    // keys, a specific-key FP is ~0 (deterministic hashes: stable)
    assert(!kept.contains(11L) && !kept.contains(999L),
      s"non-members should be pruned: $kept")
  }

  test("membership test survives negative hash values and bit 63") {
    import spark.implicits._
    // brute-force a small bitset so every word/bit path gets exercised
    val keys = (0L until 512L).map(Tuple1(_)).toDF("k")
    val kept = BloomJoin.prune(keys, $"k", keys.select($"k".as("bk")), $"bk",
      numBits = 128, k = 4).count()
    // tiny saturated bitset: everything must still pass (no negatives)
    assert(kept == 512L)
  }
}
