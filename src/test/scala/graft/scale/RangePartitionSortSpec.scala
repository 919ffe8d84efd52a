package graft.scale

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** The cluster-scale TOTAL SORT: `repartitionByRange` (sampled range
  * boundaries, one exchange) + `sortWithinPartitions` (partition-local
  * sorts) writes globally ordered output — files laid out so that
  * partition i's every key precedes partition i+1's — WITHOUT ever
  * funneling the table through one task the way `orderBy` on a write
  * path would. This is how ly_zorder's "repartitionByRange($"z")
  * before the sink" note executes, and the layout every sorted-table
  * format (Iceberg sort orders, Hive SORTED BY) expects. Boundaries
  * come from reservoir sampling, so the per-partition row counts are
  * approximate — the guarantees below (disjoint ranges, local order,
  * global concatenation order) are exact regardless of the sampling,
  * which is why this is a spec, not an oracle row (DuckDB cannot
  * replay Spark's sampled boundaries).
  */
class RangePartitionSortSpec extends SparkSpec {

  test("repartitionByRange + sortWithinPartitions yields disjoint, " +
    "locally-sorted, globally-ordered partitions with no global sort node") {
    val df = Tables(spark, sf("sf0.001"), "orders")
      .select(col("o_totalprice").as("x"), col("o_orderkey").as("k"))
      .repartitionByRange(8, col("x"), col("k"))
      .sortWithinPartitions(col("x"), col("k"))

    // no global Sort in the plan: every Sort node is partition-local
    import org.apache.spark.sql.execution.SortExec
    val plan = df.queryExecution.executedPlan
    val globalSorts = plan.collect { case s: SortExec if s.global => s }
    assert(globalSorts.isEmpty, s"global sort crept into the write path:\n$plan")

    val rows = df
      .select(spark_partition_id().as("pid"), col("x"), col("k"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val byPid = rows.groupBy(_._1).toSeq.sortBy(_._1)
    assert(byPid.size > 1, "fixture produced a single partition; widen the test")

    // local order within every partition (collect preserves the
    // within-partition order the sort wrote)
    byPid.foreach { case (pid, rs) =>
      val keys = rs.map(r => (r._2, r._3)).toSeq
      assert(keys == keys.sorted, s"partition $pid not locally sorted")
    }
    // disjoint ranges: partition i's max key < partition i+1's min key
    val bounds = byPid.map { case (pid, rs) =>
      val keys = rs.map(r => (r._2, r._3))
      (pid, keys.min, keys.max)
    }
    bounds.sliding(2).foreach {
      case Seq((p1, _, max1), (p2, min2, _)) =>
        assert(Ordering[(Double, Long)].lt(max1, min2),
          s"partitions $p1/$p2 overlap: $max1 >= $min2")
      case _ =>
    }
    // concatenating partitions in id order IS the global sort
    val concat = byPid.flatMap(_._2).map(r => (r._2, r._3)).toSeq
    assert(concat == concat.sorted, "partition concatenation != global order")
    assert(concat.size == rows.length)
  }
}
