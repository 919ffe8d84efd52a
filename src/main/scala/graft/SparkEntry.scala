package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsPack, CensusPack, DedupPack, FunctionsPack, GeoPack, LayoutPack, MultimodalPack, RelationalPack, SimilarityPack, SqlPack, StreamingPack, TextPack}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryPack's oracle-checked queries. Each pack maps
  * one region of SURVEY.md §2's operator inventory.
  */
object SparkEntry {

  private[graft] def packs: Seq[QueryPack] = Seq(
    RelationalPack, TextPack, DedupPack, SimilarityPack,
    MultimodalPack, StreamingPack, AnalyticsPack, FunctionsPack, SqlPack,
    LayoutPack, GeoPack, CensusPack
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * groupBy-count + window top-1 + broadcast joins — the reference's
    * `_merge_metadata_into_df` shape (data_utils.py:303-344).
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalPack.topSupplierPerNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
