package graft.queries

import graft.QueryPack
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-substrate census — the gate's own input, gated (VERDICT r9
  * item 6): the sf1 tier rests on `tools/ScaleUp`'s replicated corpus,
  * whose correctness was until now pinned only by ScalaTest
  * (ScaleUpSpec at ×3 on sf0.001). This row makes the substrate itself
  * driver-checkable at every tier: per-table row counts, the four
  * referential-integrity orphan counts a wrong replica offset would
  * corrupt first (lineitem→orders/part/supplier, orders→customer), and
  * per-key-domain min/max (a wrapped or collided offset moves an
  * extreme). Spark and DuckDB compute the census independently over
  * the same parquet; a corpus ScaleUp mangled can no longer back a
  * green gate silently.
  *
  * Scale shape: each metric is a column-pruned single-table aggregate
  * or an anti-join on a key — O(rows) scans, no quadratic anywhere;
  * the output is a fixed ~30 rows regardless of tier.
  */
object CensusPack extends QueryPack {

  private val countTables = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** (domain key column, owning table) for the min/max census. */
  private val domainCols = Seq(
    "c_custkey" -> "customer", "s_suppkey" -> "supplier",
    "p_partkey" -> "part", "o_orderkey" -> "orders",
    "event_id" -> "events", "user_id" -> "events",
    "doc_id" -> "documents", "vec_id" -> "embeddings")

  /** (child table, FK column, parent table, parent key) orphan pairs. */
  private val fkPairs = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scaleup_census" -> ((s, dir) => {
      // unpivot a 1-row agg to (metric, value) rows — the stack sits
      // ABOVE the aggregate, so each branch is one scan (the first
      // draft union'd per-metric aggs and re-scanned every table per
      // metric; review r10)
      def metrics(row: DataFrame): DataFrame = {
        val pairs = row.columns.map(c => s"'$c', `$c`").mkString(", ")
        row.select(expr(
          s"stack(${row.columns.length}, $pairs) AS (metric, value)"))
      }
      // one agg scan per table: count + min/max of every domain key
      // column the table owns. lineitem and orders are EXCLUDED here
      // (r15, guide §2.4 — share one pass): their count/min/max ride
      // the orphan passes below, whose left joins against DISTINCT
      // parent keys preserve multiplicity exactly, so the fused
      // aggregates are value-identical and the two largest tables are
      // scanned once instead of twice (orders was scanned three
      // times: count pass, orphan pass, keyOf projection).
      val perTable = countTables
        .filterNot(t => t == "lineitem" || t == "orders").map { t =>
        val keys = domainCols.filter(_._2 == t).map(_._1)
        val aggs = count(lit(1)).cast("long").as(s"cnt_$t") +:
          keys.flatMap(c => Seq(
            min(col(c)).cast("long").as(s"min_$c"),
            max(col(c)).cast("long").as(s"max_$c")))
        metrics(Tables(s, dir, t).agg(aggs.head, aggs.tail: _*))
      }
      // orphan census: ONE pass per child table, left-joined to each
      // parent's key projection with conditional counts — an orphan
      // row matches nothing, so the counts equal the anti-join
      // formulation's. The projection is made unique by construction
      // (ADVICE r10): without the distinct, a corruption that
      // duplicates a parent key without moving cnt/min/max would
      // multiply child rows and skew the OTHER FK columns' orphan
      // counts away from the oracle's NOT EXISTS — the diagnostic row
      // itself must be multiplicity-insensitive under any corpus state
      def keyOf(t: String, c: String) =
        Tables(s, dir, t).select(col(c)).distinct()
      val liOrphans = metrics(Tables(s, dir, "lineitem")
        .join(keyOf("orders", "o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left")
        .join(keyOf("part", "p_partkey"),
          col("l_partkey") === col("p_partkey"), "left")
        .join(keyOf("supplier", "s_suppkey"),
          col("l_suppkey") === col("s_suppkey"), "left")
        .agg(
          count(lit(1)).cast("long").as("cnt_lineitem"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .cast("long").as("orphan_lineitem_orders"),
          sum(when(col("p_partkey").isNull, 1L).otherwise(0L))
            .cast("long").as("orphan_lineitem_part"),
          sum(when(col("s_suppkey").isNull, 1L).otherwise(0L))
            .cast("long").as("orphan_lineitem_supplier")))
      // orders' own count/min/max ride the same scan as its orphan
      // census — the left-joined stream has exactly one row per order
      // and o_orderkey is untouched by the join
      val ordOrphans = metrics(Tables(s, dir, "orders")
        .join(keyOf("customer", "c_custkey"),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(
          count(lit(1)).cast("long").as("cnt_orders"),
          min(col("o_orderkey")).cast("long").as("min_o_orderkey"),
          max(col("o_orderkey")).cast("long").as("max_o_orderkey"),
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
            .cast("long").as("orphan_orders_customer")))
      (perTable :+ liOrphans :+ ordOrphans).reduce(_ unionByName _)
        .orderBy(col("metric"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "scaleup_census" -> {
      val counts = countTables.map(t =>
        s"SELECT 'cnt_$t' AS metric, CAST(count(*) AS BIGINT) AS value FROM $t")
      val orphans = fkPairs.map { case (child, fk, parent, pk) =>
        s"""SELECT 'orphan_${child}_$parent' AS metric,
           |  CAST(count(*) AS BIGINT) AS value FROM $child c
           |WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)"""
          .stripMargin
      }
      val extremes = domainCols.flatMap { case (c, t) => Seq(
        s"SELECT 'min_$c' AS metric, CAST(min($c) AS BIGINT) AS value FROM $t",
        s"SELECT 'max_$c' AS metric, CAST(max($c) AS BIGINT) AS value FROM $t")
      }
      (counts ++ orphans ++ extremes).mkString("", "\nUNION ALL\n",
        "\nORDER BY metric")
    }
  )
}
