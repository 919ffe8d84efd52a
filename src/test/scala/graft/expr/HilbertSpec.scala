package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the defining properties of the Hilbert index expression on a
  * full 32x32 grid (bits = 5, exhaustively enumerable):
  *
  *  - bijectivity: the 1024 cells map to exactly the codes 0..1023;
  *  - adjacency (the property Z-order lacks): consecutive codes are
  *    cells at Manhattan distance exactly 1 — so ANY contiguous code
  *    range, aligned or not, covers a connected region;
  *  - aligned-tile locality: every aligned block of 4^k codes spans a
  *    2^k x 2^k tile on both axes — the file-statistics pruning bound
  *    ly_hilbert's per-bucket min/max report relies on;
  *  - null propagation and the first few codes of the canonical
  *    lower-left-origin curve.
  */
class HilbertSpec extends SparkSpec {

  private val bits = 5
  private val n = 1 << bits // 32

  private def grid = spark.range(n.toLong * n).select(
    (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    .withColumn("h", HilbertIndex(col("x"), col("y"), bits))

  test("bijective on the full grid: codes are exactly 0..n*n-1") {
    val codes = grid.select("h").collect().map(_.getLong(0)).sorted
    assert(codes.toSeq == (0L until n.toLong * n))
  }

  test("consecutive codes are adjacent cells (Manhattan distance 1)") {
    val byCode = grid.collect()
      .map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1).map(_._2)
    byCode.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("aligned 4^k blocks are exact 2^k x 2^k tiles (k = 2)") {
    val spans = grid.groupBy(expr("h div 16").as("block"))
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    assert(spans.length == n * n / 16)
    spans.foreach { r =>
      assert(r.getAs[Long]("dx") <= 3 && r.getAs[Long]("dy") <= 3,
        s"block ${r.get(0)} spans ${r.get(1)}x${r.get(2)}")
    }
  }

  test("canonical curve start and null propagation") {
    import spark.implicits._
    // bits=2 walk over the 2x2 corner, hand-traced through the xy2d
    // recurrence (the s=2 level contributes 0 and swaps axes):
    // (0,0)=0, (1,0)=1, (1,1)=2, (0,1)=3. Pins the orientation
    // convention both the expression and the generated oracle share.
    val d = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .withColumn("h", HilbertIndex(col("x"), col("y"), 2))
      .orderBy("h").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(d.toSeq == Seq((0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L)))
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .withColumn("h", HilbertIndex(col("x"), col("y"), bits))
    assert(withNull.select("h").collect().head.isNullAt(0))
  }
}
