package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D cell as a codegen'd Catalyst
  * expression — the space-filling curve behind Delta Lake's liquid
  * clustering, offered next to the Morton/Z-order interleave
  * (`LayoutPack.zval`). Both map a (x, y) cell to a 1-D code whose
  * aligned 4^k blocks are exact 2^k x 2^k tiles (the file-statistics
  * pruning guarantee); Hilbert additionally guarantees consecutive
  * codes are ADJACENT cells (Manhattan distance 1), so an UNALIGNED
  * code range — what a real file boundary cuts — still covers a
  * connected region with bounded diameter, where a Z-order range can
  * jump across the whole grid at quadrant seams. HilbertSpec pins
  * bijectivity, the adjacency property, and the aligned-tile bound.
  *
  * The classic xy2d walk (top bit down, reflect+swap rotation per
  * level) is a sequential fold — as composed `Column` arithmetic its
  * expression tree grows ~3x per level, so it is implemented as ONE
  * custom expression with a tight generated loop instead (`bits`
  * iterations, long registers, no allocation). Inputs must be
  * non-negative longs below 2^bits (callers bucket via `pmod`); null
  * inputs propagate null.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires two bigint arguments, got $l and $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    var hx = a.asInstanceOf[Long]
    var hy = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((hx & s) > 0) 1L else 0L
      val ry = if ((hy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { hx = s - 1 - hx; hy = s - 1 - hy }
        val t = hx; hx = hy; hy = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $hx = $a;
         |long $hy = $b;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = ($hx & $s) > 0 ? 1L : 0L;
         |  long $ry = ($hy & $s) > 0 ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $hx = $s - 1 - $hx; $hy = $s - 1 - $hy; }
         |    long $t = $hx; $hx = $hy; $hy = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column-level entry point (no registry needed). */
  def apply(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HilbertIndex(
        org.apache.spark.sql.graft.ColumnBridge.expression(x),
        org.apache.spark.sql.graft.ColumnBridge.expression(y),
        bits))
}
