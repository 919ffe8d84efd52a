package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ architecture,
  * stated as composable DataFrame builders). The scale contract:
  * every check on a table compiles to ONE aggregate expression inside
  * ONE fused aggregation pass — adding a constraint never adds a scan
  * — and the only multi-table work is an anti join per referential
  * check. Output is long-format `(check_name, violations, total)`,
  * ready for `pass = violations === 0`.
  */
object Audit {

  sealed trait Check { def name: String }
  /** Key uniqueness: violations = rows − distinct non-null keys, so
    * null keys and duplicate keys both count. */
  final case class Unique(name: String, key: Column) extends Check
  /** Completeness: violations = null count. */
  final case class Complete(name: String, col: Column) extends Check
  /** Predicate check: violations = rows where `bad` is TRUE. A null
    * `bad` does not count — express null-handling in the predicate
    * (e.g. `c.isNull || ...`) when nulls should violate. */
  final case class Satisfies(name: String, bad: Column) extends Check

  /** All `checks` over `df` in one aggregation pass → long rows. */
  def tableChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val n = count(lit(1))
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      val v = c match {
        case Unique(_, key)    => n - countDistinct(key)
        case Complete(_, col)  => n - count(col)
        case Satisfies(_, bad) => count(when(bad, 1))
      }
      v.as(s"__v$i")
    }
    val agg = df.agg(n.as("__n"), aggs: _*)
    // explode(array(struct...)): programmatic long-format pivot — no
    // SQL-string stack(), so check names can't inject into a parser
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        col(s"__v$i").as("violations"), col("__n").as("total"))
    }
    agg.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Referential integrity: NON-NULL child keys absent from the parent
    * key set (anti join — broadcast at dim scale, shuffled + AQE
    * beyond). NULL child keys are excluded by definition, matching SQL
    * `NOT IN` / FK semantics (a left-anti join would otherwise keep
    * them, since a null join condition never matches): whether the FK
    * may be null at all is a separate `Complete` check, not an
    * orphan-reference violation. */
  def referentialIntegrity(name: String, child: DataFrame,
                           childKey: Column, parent: DataFrame,
                           parentKey: Column): DataFrame = {
    val orphans = child.select(childKey.as("__ck"))
      .where(col("__ck").isNotNull)
      .join(parent.select(parentKey.as("__pk")),
        col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    orphans.crossJoin(total)
      .select(lit(name).as("check_name"), col("violations"), col("total"))
  }

  /** Union the suite's parts and attach the verdict column. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0)
      .orderBy(col("check_name"))
}
