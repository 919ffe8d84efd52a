package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ly_orc_roundtrip gate row proves VALUE fidelity through the ORC
  * write→read cycle; this spec pins the PLAN properties of the ORC
  * scan — the format must carry the same pushdown/pruning guarantees
  * as the parquet path, or "second columnar format" is a downgrade.
  */
class OrcRoundtripSpec extends SparkSpec {

  private def plan() = {
    val dir = LayoutPack.orcCopyOfPart(spark, sf("sf0.001"))
    spark.read.orc(dir)
      .filter(col("p_size") > 25)
      .select(col("p_brand"), col("p_size"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("ORC scan pushes the filter down") {
    val p = plan()
    assert(p.contains("PushedFilters: ["), s"no pushdown section:\n$p")
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan.*"),
      s"p_size > 25 not pushed to the ORC reader:\n$p")
  }

  test("ORC scan prunes to the projected columns") {
    val p = plan()
    val read = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema in:\n$p"))
    assert(!read.contains("p_retailprice") && !read.contains("p_name"),
      s"ORC scan reads unprojected columns: $read")
  }

  test("round-trip preserves every row bit-for-bit") {
    val dir = sf("sf0.001")
    val orig = graft.io.Tables(spark, dir, "part")
    val back = spark.read.orc(LayoutPack.orcCopyOfPart(spark, dir))
    assert(back.schema === orig.schema)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }
}
