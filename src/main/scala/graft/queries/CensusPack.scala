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
      def metric(name: String, df: DataFrame): DataFrame =
        df.select(lit(name).as("metric"), col("value").cast("long"))
      val counts = countTables.map(t => metric(s"cnt_$t",
        Tables(s, dir, t).agg(count(lit(1)).as("value"))))
      val orphans = fkPairs.map { case (child, fk, parent, pk) =>
        metric(s"orphan_${child}_$parent",
          Tables(s, dir, child)
            .join(Tables(s, dir, parent), col(fk) === col(pk), "left_anti")
            .agg(count(lit(1)).as("value")))
      }
      val extremes = domainCols.flatMap { case (c, t) =>
        val mm = Tables(s, dir, t)
          .agg(min(col(c)).cast("long").as("mn"),
            max(col(c)).cast("long").as("mx"))
        Seq(metric(s"min_$c", mm.select(col("mn").as("value"))),
          metric(s"max_$c", mm.select(col("mx").as("value"))))
      }
      (counts ++ orphans ++ extremes).reduce(_ unionByName _)
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
