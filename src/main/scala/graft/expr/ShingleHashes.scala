package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct xxhash64 values of a text's word n-gram shingles,
  * as one codegen'd expression.
  *
  * The composed-HOF formulation (transform + concat_ws + element_at +
  * array_distinct + explode + xxhash64) interprets several lambdas per
  * shingle and allocates every shingle string; this expression walks
  * the UTF-8 bytes once and hashes each shingle AS A BYTE RANGE of the
  * original text — a word n-gram joined by single spaces IS a substring
  * of the single-space-tokenized text, so the hashes are bit-identical
  * to `xxhash64(concat_ws(' ', w_i..w_{i+n-1}))` (same XXH64, same
  * seed 42) with zero per-shingle allocation.
  *
  * Output: sorted distinct hashes — exactly the
  * `sort_array(collect_set(...))` verification currency of the dedup
  * operators, computed before the explode instead of after.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires (string, n >= 1), got ${child.dataType}, n=$n")

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.hash(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleHashes.hash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Column API (no registry needed). */
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ShingleHashes(org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  /** Shared by interpreted eval and generated code. NOT named `eval`:
    * the case class inherits Expression.eval, which suppresses the
    * companion's static forwarder — janino then can't resolve the
    * static call and Spark silently falls back to interpreted eval
    * (caught in round 1 as a CompileException in the test log). */
  def hash(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // word start offsets under split-on-every-' ' semantics (empty
    // words kept, matching split(text, ' ') / string_split)
    var words = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') words += 1; i += 1 }
    if (words < n || bytes.length == 0)
      return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](words)
    var w = 1
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val count = words - n + 1
    // primitive sort + in-place dedup instead of TreeSet<Long>: same
    // sorted-distinct output with zero boxing/node allocation — this
    // runs once per document on every near-dup path's hot build
    val all = new Array[Long](count)
    var k = 0
    while (k < count) {
      val from = starts(k)
      // end of word k+n-1: next start minus the separator, or text end
      val until = if (k + n < words) starts(k + n) - 1 else bytes.length
      all(k) = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
      k += 1
    }
    java.util.Arrays.sort(all)
    var uniq = 0
    var i2 = 0
    while (i2 < count) {
      if (i2 == 0 || all(i2) != all(i2 - 1)) { all(uniq) = all(i2); uniq += 1 }
      i2 += 1
    }
    val out = if (uniq == count) all else java.util.Arrays.copyOf(all, uniq)
    new GenericArrayData(out)
  }
}
