package graft.scale

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact running (prefix) SUM over a window whose PARTITION column has
  * too few values to parallelize.
  *
  * `Window.partitionBy(p).orderBy(k).rowsBetween(unboundedPreceding,
  * currentRow)` puts each partition's ENTIRE row set through one task.
  * That is correct but sequential: with a 3-value partition column over
  * 600M rows, the plan is 3 tasks of 200M-row sorts no matter how many
  * executors the cluster has (measured: the fn_window_distinct dump at
  * the sf100 tier spent ~25 minutes in exactly this shape). The fix is
  * the same two-level scheme GlobalRank uses for global row_number,
  * applied to a prefix sum:
  *
  *  1. sample approximate splitters for the leading ORDER column
  *     (`approx_percentile` — one scan, mergeable sketch, load-balance
  *     only, never affects the output);
  *  2. assign each row a chunk id by comparing against the splitter
  *     literals (codegen expression, no shuffle); ties on a splitter
  *     value all land in one chunk (`v >= s`), so chunk boundaries
  *     always align with the total order as long as the splitters are
  *     drawn from the LEADING order column;
  *  3. local running sum over a window partitioned by (partition,
  *     chunk) — parallel: |partitions| × nChunks tasks;
  *  4. per-(partition, chunk) totals (map-side-combined aggregate,
  *     ≤ |partitions| × nChunks rows collected — bounded by the cap
  *     below, the GlobalRank offset class);
  *  5. running sum = chunk offset (exclusive prefix of chunk totals
  *     within the partition, applied via a BROADCAST hash join on the
  *     (partition, chunk) key — O(1) per row, not a |p|×nChunks
  *     nested CASE) + local running sum.
  *
  * The result is EXACT for any summand whose addition is associative
  * and order-insensitive at the values used — integer/long flags and
  * counts (the intended use) unconditionally; doubles only up to
  * float associativity, so keep doubles on the decimal/integer lattice
  * first (the q1_agg doctrine).
  *
  * GUARDS (the helper is for LOW-cardinality partitions over a
  * NUMERIC leading order column; anything else silently degenerated
  * before — now it falls back loudly-in-the-plan to the direct form):
  *  - non-numeric `orderCol` → direct window (approx_percentile needs
  *    a numeric sketch; splitters over strings would need a different
  *    sampler, and high-cardinality string orders belong to the
  *    direct form anyway);
  *  - more than `MaxOffsetRows` (65,536) (partition, chunk) totals →
  *    direct window (a high-cardinality partCol already parallelizes;
  *    the two-level rewrite would only blow up the driver offsets) —
  *    detected with a limit(cap+1) probe BEFORE any unbounded collect;
  *  - input columns named `__rs_*` → IllegalArgumentException (the
  *    helper's working columns would silently shadow them).
  *
  * Callers: fn_window_distinct (running distinct count over 3
  * l_returnflag partitions), behind SPARK_GRAFT_RUNNING_SUM=1. Use the
  * plain window when the partition column is high-cardinality — the
  * extra exchange+aggregate here buys nothing once partitions are
  * already small.
  */
object RunningSum {

  /** Above this many (partition, chunk) total rows the offset table is
    * no longer "bounded by construction" — fall back to the direct
    * window (which parallelizes fine at that partition cardinality). */
  val MaxOffsetRows = 65536

  /** Adds `outCol` = sum(valueCol) over (PARTITION BY partCol ORDER BY
    * orderCol, tieBreak ROWS UNBOUNDED PRECEDING..CURRENT ROW) to
    * `df`, parallelized |partCol values| × nChunks ways. `orderCol`
    * must be the leading column of the intended total order and
    * `tieBreak` must complete it (unique per (partCol, orderCol,
    * tieBreak)); `valueCol` must be integral (LongType sum).
    */
  def withRunningSum(df: DataFrame, partCol: Column, orderCol: Column,
                     tieBreak: Seq[Column], valueCol: Column,
                     outCol: String, nChunks: Int = 32,
                     persistInput: Boolean = true): DataFrame = {
    require(!df.columns.exists(_.startsWith("__rs_")),
      s"input already has __rs_* columns (${df.columns.filter(_.startsWith("__rs_")).mkString(",")}) — " +
        "the helper's working columns would shadow them")

    def directForm: DataFrame = {
      val w = Window.partitionBy(partCol)
        .orderBy(orderCol +: tieBreak: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(outCol, sum(valueCol.cast("long")).over(w))
    }

    val base = df
      .withColumn("__rs_p", partCol)
      .withColumn("__rs_v", orderCol)
      .withColumn("__rs_x", valueCol.cast("long"))

    // numeric-orderCol requirement: the splitter sketch is a numeric
    // percentile — anything else (string, array…) gets the direct form
    // instead of an AnalysisException from deep inside approx_percentile
    val orderOk = base.schema("__rs_v").dataType match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    if (!orderOk) return directForm

    // Three consumers read the input (splitter sketch, chunk totals,
    // the windowed result) — persist it once (CacheRegistry contract,
    // released by the caller's post-action drain) unless the caller
    // knows the input is a cheap scan (persistInput = false skips the
    // cache-memory cost where recompute is cheaper).
    val keyed =
      if (!persistInput) base
      else {
        val k = base.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        CacheRegistry.track(k)
        k
      }

    // 1. splitters on the leading order column (quantile sketch; null
    // on empty input -> single chunk). ApproximatePercentile natively
    // supports date/timestamp and returns the input type, so the
    // splitter literals compare exactly on the column's own lattice.
    val fracs = (1 until nChunks).map(i => i.toDouble / nChunks)
    val sRow = keyed
      .agg(approx_percentile(col("__rs_v"), lit(fracs.toArray), lit(10000)))
      .head()
    val splitterVals =
      if (sRow.isNullAt(0)) Seq.empty[Any] else sRow.getSeq[Any](0).distinct
    val splitterLits = splitterVals.map(lit)

    // 2. chunk id = #splitters at or below the leading order value
    val chunkExpr = splitterLits
      .map(sv => when(col("__rs_v") >= sv, 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))
    val chunked = keyed.withColumn("__rs_chunk", chunkExpr)

    // 4. per-(partition, chunk) totals -> EXCLUSIVE prefix offsets
    // within each partition. The limit(cap+1) probe bounds the collect
    // BEFORE it happens: a high-cardinality partCol overflows the cap
    // and takes the direct window (already parallel at that
    // cardinality) instead of blowing up the driver.
    val totalsDf = chunked.groupBy(col("__rs_p"), col("__rs_chunk"))
      .agg(sum(col("__rs_x")).as("t"))
    val probe = totalsDf.limit(MaxOffsetRows + 1).collect()
    if (probe.length > MaxOffsetRows) {
      if (persistInput) keyed.unpersist()
      return directForm
    }
    val totals = probe.map(r => (r.get(0), r.getInt(1)) -> r.getLong(2))
    val offsets: Seq[((Any, Int), Long)] = totals
      .groupBy(_._1._1)
      .toSeq
      .flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._1._2).map { case ((p, c), t) =>
          val o = (p, c) -> acc; acc += t; o
        }
      }

    // 5. offset lookup as a BROADCAST join on the tiny offsets frame:
    // O(1) per row, any partCol data type (null-safe key), and the
    // codegen'd hash probe replaces the old per-row nested CASE whose
    // cost grew with |partitions| × nChunks.
    val spark = df.sparkSession
    val offSchema = StructType(Seq(
      StructField("__rs_op", base.schema("__rs_p").dataType, nullable = true),
      StructField("__rs_oc", IntegerType, nullable = false),
      StructField("__rs_off", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val offRows = offsets.map { case ((p, c), o) => Row(p, c, o) }
    val offDf = spark.createDataFrame(offRows.asJava, offSchema)

    // 3 + 5. parallel local prefix sum + offset
    val w = Window.partitionBy(col("__rs_p"), col("__rs_chunk"))
      .orderBy(col("__rs_v") +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked
      .join(broadcast(offDf),
        col("__rs_p") <=> col("__rs_op") && col("__rs_chunk") === col("__rs_oc"),
        "left")
      .withColumn(outCol,
        sum(col("__rs_x")).over(w) + coalesce(col("__rs_off"), lit(0L)))
      .drop("__rs_p", "__rs_v", "__rs_x", "__rs_chunk",
        "__rs_op", "__rs_oc", "__rs_off")
  }
}
