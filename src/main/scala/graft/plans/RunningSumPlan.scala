package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** RIDE-THE-OUTPUT-SORT running sum — the SCALE.md design that makes
  * the low-cardinality running window cost STRICTLY FEWER sorts than
  * the direct form instead of more passes (guide preference (c):
  * custom LogicalPlan + SparkStrategy + SparkPlan).
  *
  * The direct `Window.partitionBy(p).orderBy(k)` plan sorts the corpus
  * twice when the query also ends in `ORDER BY (p, k)` — once
  * hash-clustered for the window (|p| whole-corpus tasks when p has 3
  * values), once range-partitioned for the output — and the two-level
  * `scale/RunningSum` rewrite, while |p|×32-way parallel, pays two
  * extra corpus passes (splitter sketch + chunk totals) ON TOP of the
  * output sort. This operator declares
  * `requiredChildDistribution = OrderedDistribution(p, k…)` and the
  * matching child ordering, so EnsureRequirements inserts exactly ONE
  * range exchange + sort — and `outputPartitioning`/`outputOrdering`
  * re-expose it, so the query's trailing ORDER BY on the same keys is
  * planned as a NO-OP. Execution on the sorted runs:
  *
  *  1. one pass (`sparkContext.runJob` over the persisted child RDD)
  *     collects per-partition BOUNDARY-run totals — at most the first
  *     and last run of each partition (the only runs that can span a
  *     boundary under range partitioning), so the driver harvest is
  *     ≤ 2 × #partitions rows regardless of |p| cardinality;
  *  2. the driver turns totals into EXCLUSIVE prefix offsets per part
  *     key across the partition order (range partitioning makes
  *     partition index order = global key order) and broadcasts them;
  *  3. the output pass streams each sorted partition once with O(1)
  *     state (current part key + accumulator seeded from the offset),
  *     appending the running sum column. No window buffering, no
  *     chunk column, no second sort.
  *
  * Parallelism = #range partitions (spark.sql.shuffle.partitions),
  * independent of |p| — the property the 3-task direct form lacks.
  * Contract: `value` must be integral AND non-nullable (CHECKED in
  * `withRunningSumSorted` — a nullable value would silently diverge
  * from SQL window SUM, which stays NULL until the first non-null,
  * while this operator would map NULL to 0; callers feed non-null
  * 0/1 flags and RunningSumRideSpec pins the checked contract).
  *
  * The child RDD is persisted (MEMORY_AND_DISK) across the two passes
  * and tracked in `scale/CacheRegistry`, so the harnesses drain it
  * deterministically after each query's action instead of waiting on
  * ContextCleaner GC; at 100 TB the totals pass reads the shuffle
  * files the range exchange already wrote, so the extra cost is one
  * local scan, not a recompute.
  */
case class RunningSumPlan(child: LogicalPlan, partCols: Seq[Expression],
                          orderCols: Seq[Expression], value: Expression,
                          outAttr: Attribute) extends UnaryNode {
  // outAttr is a constructor param, not a fresh AttributeReference per
  // instance: analyzer/optimizer copies of this node must keep the
  // same exprId or every downstream reference to the column dangles.
  // It is PRODUCED here (the Generate pattern), not consumed —
  // without producedAttributes CheckAnalysis reads it as a missing
  // input reference.
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions
    .AttributeSet = org.apache.spark.sql.catalyst.expressions
    .AttributeSet(Seq(outAttr))
  override protected def withNewChildInternal(c: LogicalPlan): RunningSumPlan =
    copy(child = c)
}

object RunningSumStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case r: RunningSumPlan =>
      RunningSumExec(planLater(r.child), r.partCols, r.orderCols, r.value,
        r.output.last) :: Nil
    case _ => Nil
  }
}

case class RunningSumExec(child: SparkPlan, partCols: Seq[Expression],
                          orderCols: Seq[Expression], value: Expression,
                          outAttr: Attribute) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr

  private def sortOrders: Seq[SortOrder] =
    (partCols ++ orderCols).map(SortOrder(_, Ascending))

  // ONE range exchange + sort serves the window AND the query's
  // trailing ORDER BY on the same keys (outputOrdering re-exposes it)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(sortOrders))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(sortOrders)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = sortOrders

  // Driver-visible gauge of the pass-1 harvest: total boundary-run
  // entries collected (≤ 2 × #partitions BY CONSTRUCTION — the spec
  // pins the bound on a high-cardinality partition column).
  override lazy val metrics = Map(
    "boundaryRuns" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "pass-1 boundary runs collected"))

  override protected def doExecute(): RDD[InternalRow] = {
    // copy() before persist: execute() iterators hand out REUSED
    // mutable UnsafeRow buffers — caching them raw stores N aliases
    // of the last row's bytes (caught by RunningSumRideSpec: every
    // cached row in a batch carried the final row's key)
    val childRDD = child.execute().map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Deterministic release at SQL-execution end (the r7
    // cache-ledger doctrine, adapted for physical operators): under
    // AQE this doExecute runs on a materialization-pool thread, so
    // the THREAD-LOCAL ledger can't work here — CacheRegistry keys
    // the unpersist on the current execution id instead, so a 12 GB
    // sf100 child is dropped the moment its query's action finishes
    // rather than lingering until ContextCleaner GC. Early release is
    // never a correctness risk: a recompute re-reads the range
    // exchange's shuffle files.
    graft.scale.CacheRegistry.releaseOnExecutionEnd(childRDD)
    // bind OUTSIDE the closures: only serializable bound expressions
    // and plain values are captured, never the plan node itself
    val boundPart = partCols.map(BindReferences.bindReference(_, child.output))
    val boundValue = BindReferences.bindReference(value, child.output)

    // pass 1: BOUNDARY runs only. The child is range-partitioned on
    // (partCols ++ orderCols), so a part key's rows are globally
    // contiguous: only a partition's FIRST and LAST runs can continue
    // across a partition boundary — middle runs are strictly interior
    // and always start at offset 0. Each task therefore ships at most
    // TWO (key, total) entries, making the driver harvest ≤
    // 2 × #partitions rows REGARDLESS of |partCols| cardinality (the
    // bounded-by-construction form of the MaxOffsetRows probe guard
    // its two-level twin uses, scale/RunningSum.scala — no cap, no
    // fallback, no driver blow-up for any caller).
    val totals: Array[Array[(UnsafeRow, Long)]] =
      sparkContext.runJob(childRDD, (iter: Iterator[InternalRow]) => {
        val pp = UnsafeProjection.create(boundPart)
        var firstKey: UnsafeRow = null
        var firstSum = 0L
        var cur: UnsafeRow = null
        var sum = 0L
        var runs = 0
        iter.foreach { row =>
          val k = pp(row)
          if (cur == null || k != cur) {
            if (cur != null && runs == 1) { firstKey = cur; firstSum = sum }
            cur = k.copy(); sum = 0L; runs += 1
          }
          val v = boundValue.eval(row)
          if (v != null) sum += v.asInstanceOf[Number].longValue()
        }
        if (cur == null) Array.empty[(UnsafeRow, Long)]
        else if (runs == 1) Array((cur, sum))
        else Array((firstKey, firstSum), (cur, sum))
      })
    longMetric("boundaryRuns").add(totals.iterator.map(_.length.toLong).sum)

    // driver: exclusive prefix for the boundary-spanning keys only.
    // A run that BEGINS inside a partition has no earlier-partition
    // contribution (offset 0, pass 2's getOrElse default); the only
    // nonzero offsets belong to partitions whose first key continues
    // the previous non-empty partition's last key. carry = the
    // continued key's total accumulated over all earlier partitions.
    val offsets = scala.collection.mutable.HashMap[(Int, UnsafeRow), Long]()
    var curKey: UnsafeRow = null
    var carry = 0L
    for (pid <- totals.indices if totals(pid).nonEmpty) {
      val part = totals(pid)
      val (fk, ft) = part.head
      val continues = curKey != null && fk == curKey
      if (continues) offsets((pid, fk)) = carry
      if (part.length == 1) {
        // the whole partition is one run of fk
        if (continues) carry += ft else { curKey = fk; carry = ft }
      } else {
        val (lk, lt) = part.last
        curKey = lk; carry = lt
      }
    }
    val bcast: Broadcast[Map[(Int, UnsafeRow), Long]] =
      sparkContext.broadcast(offsets.toMap)

    // pass 2: stream each sorted partition once with O(1) state
    val outAttrs = output
    childRDD.mapPartitionsWithIndex { (pid, iter) =>
      val pp = UnsafeProjection.create(boundPart)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joiner = new JoinedRow
      val extra = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      val local = bcast.value
      var cur: UnsafeRow = null
      var acc = 0L
      iter.map { row =>
        val k = pp(row)
        if (cur == null || k != cur) {
          cur = k.copy()
          acc = local.getOrElse((pid, cur), 0L)
        }
        val v = boundValue.eval(row)
        if (v != null) acc += v.asInstanceOf[Number].longValue()
        extra.update(0, acc)
        proj(joiner(row, extra))
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): RunningSumExec =
    copy(child = c)
}

/** User-facing API (the AsOf.join pattern). */
object RunningSumRide {

  /** EXACT 1-based global row_number over the total order `orderCols`
    * with ONE range sort and no single-partition funnel: a global
    * rank IS a running count, i.e. this operator with an EMPTY
    * partition list and value 1. Subsumes scale/GlobalRank's
    * two-level scheme (splitter sketch + chunk window + offset add —
    * two corpus passes more) wherever the caller's final output order
    * is the rank order itself: outputOrdering re-exposes the sort, so
    * a trailing ORDER BY on `orderCols` plans to nothing. */
  def withGlobalRankSorted(spark: SparkSession, df: DataFrame,
                           orderCols: Seq[Column],
                           rankCol: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    withRunningSumSorted(spark, df, Seq.empty, orderCols, lit(1L), rankCol)
  }

  def withRunningSumSorted(spark: SparkSession, df: DataFrame,
                           partCols: Seq[Column], orderCols: Seq[Column],
                           valueCol: Column, outName: String): DataFrame = {
    this.synchronized {
      if (!spark.experimental.extraStrategies.contains(RunningSumStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ RunningSumStrategy
    }
    import org.apache.spark.sql.graft.DatasetBridge
    // resolve each Column against df through a real analysis pass —
    // Spark 4 Columns are unresolved ColumnNode wrappers until a
    // Dataset operation analyzes them, and a custom logical node gets
    // no such pass for its OWN expression args. df.select(c) reuses
    // df's cached analyzed plan, so the attribute ids line up with
    // DatasetBridge.plan(df) below.
    def resolve(c: Column): Expression =
      df.select(c).queryExecution.analyzed match {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.head match {
            case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
            case e => e
          }
        case other => sys.error(s"unexpected shape resolving column: $other")
      }
    val valueExpr = resolve(valueCol)
    // Checked contract (ADVICE r12): the exec maps NULL values to 0,
    // which DIVERGES from SQL window SUM (NULL until the first
    // non-null). Rather than let an adaptive direct/ride switch
    // return different results by tier, reject nullable values here
    // with an actionable message.
    require(!valueExpr.nullable,
      s"RunningSumRide: value expression $valueExpr is nullable, and the " +
        "ride operator's NULL-contributes-0 semantics differ from SQL " +
        "window SUM (NULL until first non-null). Wrap the value in " +
        "coalesce(value, 0) to opt into 0-for-NULL explicitly, or use " +
        "the direct window / scale.RunningSum for SQL NULL semantics.")
    DatasetBridge.ofRows(spark,
      RunningSumPlan(DatasetBridge.plan(df),
        partCols.map(resolve), orderCols.map(resolve),
        valueExpr,
        AttributeReference(outName, LongType, nullable = false)()))
  }
}
