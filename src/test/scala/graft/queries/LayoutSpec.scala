package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The z-order layout guarantee the oracle's value compare can't
  * express: contiguous z-ranges are small tiles, so every bucket's
  * min/max span is bounded on BOTH dimensions — the file-statistics
  * property that makes multi-column pruning work. A bucket of 2^14
  * contiguous 20-bit z-codes covers exactly a 128x128 (x, y) tile. */
class LayoutSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("ly_zorder buckets are 128x128 tiles: both spans bounded") {
    val out = LayoutPack.queries("ly_zorder")(spark, dir)
      .withColumn("x_span", col("x_max") - col("x_min"))
      .withColumn("y_span", col("y_max") - col("y_min"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (b, xs, ys) = (r.getLong(0), r.getLong(6), r.getLong(7))
      assert(xs <= 127, s"bucket $b x-span $xs exceeds the 128-tile bound")
      assert(ys <= 127, s"bucket $b y-span $ys exceeds the 128-tile bound")
    }
  }

  test("j10_merge_upsert exercises all three merge branches") {
    val actions = RelationalPack.queries("j10_merge_upsert")(spark, dir)
      .groupBy(col("action")).count().collect()
      .map(r => r.getString(0)).toSet
    assert(actions == Set("insert", "keep", "update"),
      s"merge branches not all exercised: $actions")
  }
}
