package graft.scale

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Retry-determinism contract, tested the way a cluster breaks it.
  *
  * Production Spark re-executes failed tasks (spark.task.maxFailures=4
  * by default; speculation re-runs even healthy ones). Any operator
  * whose output depends on per-attempt state — `rand()` salts,
  * `monotonically_increasing_id()`, unseeded sampling — can duplicate
  * or lose rows when a retry recomputes a partition differently.
  * SkewJoin, GlobalRank, and the curation sampler all document
  * content-deterministic designs for exactly this reason; these specs
  * hold them to it by injecting a first-attempt task failure (the
  * shared master is local[4, 2], so the stage is retried exactly like
  * a lost executor) and asserting bit-identical output.
  */
class TaskRetrySpec extends SparkSpec {

  /** Fails the first attempt of one task of whatever stage evaluates
    * this df; the retried attempt passes rows through untouched. Each
    * ACTION on the result re-evaluates the stage and re-injects, so
    * every job downstream of this df exercises a retry. */
  private def failFirstAttempt(df: DataFrame): DataFrame = {
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("TaskRetrySpec: injected task failure")
      it
    }(Encoders.row(df.schema))
  }

  private def canonical(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toIndexedSeq.sorted

  test("harness: attempt-0 failure is retried, not fatal, under local[4, 2]") {
    val df = failFirstAttempt(spark.range(0, 1000, 1, 4).toDF("id"))
    assert(df.count() === 1000)
    // aggregate over the retried stage sees each row exactly once
    assert(df.agg(sum("id")).head().getLong(0) === 499500L)
  }

  test("saltedJoin: output identical when a fact-side task is retried") {
    // skewed fact: key 0 is hot, like the real use case
    val fact = spark.range(0, 5000, 1, 4)
      .select((when(col("id") % 10 < 7, 0).otherwise(col("id") % 10)).as("k"),
        col("id").as("v"))
    val dim = spark.range(10)
      .select(col("id").as("k"), concat(lit("d"), col("id")).as("w"))
    val plain = canonical(SkewJoin.saltedJoin(fact, dim, "k", salt = 8))
    val retried = canonical(
      SkewJoin.saltedJoin(failFirstAttempt(fact), dim, "k", salt = 8))
    assert(retried === plain)
    assert(plain.size === 5000) // multiplicity preserved too
  }

  test("GlobalRank: every job of the multi-job plan survives a retry") {
    // GlobalRank runs three jobs over the input (splitter sketch +
    // count, per-chunk counts, final ranked scan); the injector fires
    // in each one, so the sketch, the offsets, and the output all see
    // a retried partition.
    val df = spark.range(0, 20000, 1, 4)
      .select((col("id") * 2654435761L % 97).as("x"), col("id"))
    val plain = canonical(
      GlobalRank.withGlobalRank(df, col("x"), col("id"), "rnk"))
    val retried = canonical(
      GlobalRank.withGlobalRank(failFirstAttempt(df), col("x"), col("id"), "rnk"))
    assert(retried === plain)
  }

  test("content-fingerprint sampling: keep/drop fate survives a retry") {
    // the t_sample design: keep iff pmod(fingerprint(text), 100) < quota
    // — a pure function of the row, unlike rand()-based sampling which
    // a retry would re-roll.
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    def kept(d: DataFrame): Seq[String] = canonical(
      d.where(pmod(graft.expr.CharFingerprint(col("text")), lit(100)) < 30)
        .select(col("doc_id")))
    val plain = kept(docs)
    val retried = kept(failFirstAttempt(docs))
    assert(retried === plain)
    assert(plain.nonEmpty)
  }

  test("counter-example: rand() sampling is NOT retry-stable (why the rule exists)") {
    // rand(seed) is seeded per-PARTITION and advances per row, so a
    // clean retry of the same partition IS deterministic — but any
    // repartitioning upstream of it (here: a shuffle whose input order
    // AQE/retries may change) makes row->draw assignment unstable.
    // This test documents the sharp edge the content-hash rule avoids:
    // the draw depends on within-partition ORDER, not row content.
    val base = spark.range(0, 1000, 1, 4).toDF("id")
    val drawsByPosition = base
      .repartition(4, col("id") % 4)
      .sortWithinPartitions("id")
      .withColumn("draw", rand(42))
    val a = canonical(drawsByPosition)
    // same rows, same partitioning, different within-partition order
    val b = canonical(base
      .repartition(4, col("id") % 4)
      .sortWithinPartitions(col("id").desc)
      .withColumn("draw", rand(42)))
    assert(a !== b) // identical row SETS, different draws
  }
}
