package graft.quality

import graft.SparkSpec
import graft.quality.Audit.{Complete, Satisfies, Unique}
import org.apache.spark.sql.functions._

/** The dq_audit fixture data is clean except negative balances, so the
  * duplicate / null / domain / orphan counters are zero there — this
  * spec plants each violation class and pins the exact counts. */
class AuditSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toList

  test("every violation class is counted exactly") {
    import spark.implicits._
    val dirty = Seq[(java.lang.Long, String, Double, String)](
      (1L, "alice", 10.0, "BUILDING"),
      (1L, "bob", -5.0, "BUILDING"),     // dup key + negative balance
      (2L, null, 3.0, "MACHINERY"),      // null name
      (null, "carol", 7.0, "PLASTICS"),  // null key + bad segment
      (3L, "dave", 0.0, "FURNITURE"))
      .toDF("k", "name", "bal", "seg")
    val got = rows(Audit.report(Seq(Audit.tableChecks(dirty, Seq(
      Unique("t.k unique", col("k")),
      Complete("t.name complete", col("name")),
      Satisfies("t.bal non_negative", col("bal") < 0),
      Satisfies("t.seg in_domain",
        !col("seg").isin("BUILDING", "MACHINERY", "FURNITURE")))))))
    assert(got == List(
      // 5 rows, 3 distinct non-null keys -> dup+null keys = 2
      ("t.bal non_negative", 1L, 5L, false),
      ("t.k unique", 2L, 5L, false),
      ("t.name complete", 1L, 5L, false),
      ("t.seg in_domain", 1L, 5L, false)))
  }

  test("referential integrity counts orphans, not matches") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 9L, 8L).toDF("fk")
    val got = rows(Audit.report(Seq(Audit.referentialIntegrity(
      "child.fk references parent", child, col("fk"), parent, col("pk")))))
    assert(got == List(("child.fk references parent", 2L, 5L, false)))
  }

  test("a clean table passes every check") {
    import spark.implicits._
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val got = rows(Audit.report(Seq(Audit.tableChecks(clean, Seq(
      Unique("c.k unique", col("k")),
      Complete("c.name complete", col("name")))))))
    assert(got.forall(_._4) && got.forall(_._2 == 0L))
  }

  test("all checks on a table fuse into one aggregation pass (one scan)") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("k", "name", "v")
    val plan = Audit.tableChecks(df, Seq(
      Unique("u", col("k")), Complete("c", col("name")),
      Satisfies("s", col("v") < 0)))
      .queryExecution.executedPlan.toString
    // one LocalTableScan feeding the whole suite
    assert("LocalTableScan".r.findAllIn(plan).size == 1, plan)
  }
}
