package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *     ≤ |partitions| × nChunks rows collected — bounded by
  *     construction, the GlobalRank offset class);
  *  5. running sum = chunk offset (exclusive prefix of chunk totals
  *     within the partition) + local running sum.
  *
  * The result is EXACT for any summand whose addition is associative
  * and order-insensitive at the values used — integer/long flags and
  * counts (the intended use) unconditionally; doubles only up to
  * float associativity, so keep doubles on the decimal/integer lattice
  * first (the q1_agg doctrine).
  *
  * Callers: fn_window_distinct (running distinct count over 3
  * l_returnflag partitions). Use the plain window when the partition
  * column is high-cardinality — the extra exchange+aggregate here buys
  * nothing once partitions are already small.
  */
object RunningSum {

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
    // Three consumers read the input (splitter sketch, chunk totals,
    // the windowed result) — persist it once (CacheRegistry contract,
    // released by the caller's post-action drain) unless the caller
    // knows the input is a cheap scan (persistInput = false skips the
    // cache-memory cost where recompute is cheaper).
    val base = df
      .withColumn("__rs_p", partCol)
      .withColumn("__rs_v", orderCol)
      .withColumn("__rs_x", valueCol.cast("long"))
    val keyed =
      if (!persistInput) base
      else {
        val k = base.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        CacheRegistry.track(k)
        k
      }

    // 1. splitters on the leading order column (quantile sketch; null
    // on empty input -> single chunk)
    val fracs = (1 until nChunks).map(i => i.toDouble / nChunks)
    val sRow = keyed
      .agg(approx_percentile(col("__rs_v"), lit(fracs.toArray), lit(10000)))
      .head()
    val splitters =
      if (sRow.isNullAt(0)) Seq.empty[Any] else sRow.getSeq[Any](0).distinct

    // 2. chunk id = #splitters at or below the leading order value
    val chunkExpr = splitters
      .map(sv => when(col("__rs_v") >= lit(sv), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))
    val chunked = keyed.withColumn("__rs_chunk", chunkExpr)

    // 4. per-(partition, chunk) totals -> EXCLUSIVE prefix offsets
    // within each partition (bounded collect: |partitions| x nChunks)
    val totals = chunked.groupBy(col("__rs_p"), col("__rs_chunk"))
      .agg(sum(col("__rs_x")).as("t"))
      .collect()
      .map(r => (r.get(0), r.getInt(1)) -> r.getLong(2))
    val offsets: Map[(Any, Int), Long] = totals
      .groupBy(_._1._1)
      .flatMap { case (p, rows) =>
        var acc = 0L
        rows.sortBy(_._1._2).map { case ((_, c), t) =>
          val o = (p, c) -> acc; acc += t; o
        }
      }
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (e, ((p, c), o)) =>
      when(col("__rs_p") <=> lit(p) && col("__rs_chunk") === c, o)
        .otherwise(e)
    }

    // 3 + 5. parallel local prefix sum + offset
    val w = Window.partitionBy(col("__rs_p"), col("__rs_chunk"))
      .orderBy(col("__rs_v") +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked
      .withColumn(outCol, sum(col("__rs_x")).over(w) + offsetExpr)
      .drop("__rs_p", "__rs_v", "__rs_x", "__rs_chunk")
  }
}
