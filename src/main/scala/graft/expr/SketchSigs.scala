package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Per-document sketch signatures as codegen'd expressions over the
  * shingle-hash array (ShingleHashes output).
  *
  * With per-doc feature arrays available NARROWLY (no explode), the
  * classic "groupBy(doc) + sketch aggregation" stage disappears: the
  * signature is a projection, the only shuffle left in a sketch-based
  * dedup is the candidate bucket join itself. At 100 TB that converts
  * the sketch stage from a 2-phase shuffle over every (doc, feature)
  * row into an embarrassingly parallel map.
  */
object SketchSigs {

  private val P = 2147483647L // 2^31 - 1

  // permutation tables per (numPerms, seed), built once per JVM
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  private def perms(numPerms: Int, seed: Long): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent((numPerms, seed), { case (np, sd) =>
      val rng = new scala.util.Random(sd)
      (Array.fill(np)(1L + math.floorMod(rng.nextLong(), P - 1)),
        Array.fill(np)(math.floorMod(rng.nextLong(), P)))
    })

  /** MinHash signature: per-permutation minima of (a*h + b) mod P.
    * Parameters must be independent draws (see the structured-family
    * recall bug documented in DedupPack/BASELINE).
    *
    * Inner loop uses plain `%`, not floorMod: h ∈ [0,P) and
    * a ∈ [1,P-1] ⇒ h*a + b ≤ (P-1)² + P-1 < 2^62 — never negative,
    * never overflowing, so the two are identical and `%` skips the
    * sign-fix branch on the hottest multiply in the dedup family. */
  def minHash(hashes: ArrayData, numPerms: Int, seed: Long): ArrayData = {
    val (as, bs) = perms(numPerms, seed)
    val out = Array.fill(numPerms)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = math.floorMod(hashes.getLong(i), P)
      var p = 0
      while (p < numPerms) {
        val v = (h * as(p) + bs(p)) % P
        if (v < out(p)) out(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** FUSED text → MinHash signature (VERDICT r10 item 3): one byte
    * walk hashes each word n-gram as a byte range of the text (the
    * ShingleHashes trick, bit-identical hash values) and folds it
    * into the per-permutation minima IN PLACE — the shingle-hash
    * array is never materialized, sorted, or deduplicated. Identical
    * to `minHash(ShingleHashes.hash(text, n), numPerms, seed)` because
    * min() is idempotent under duplicate shingles and order-blind
    * (parity spec-pinned); the empty/short-text case degenerates to
    * the same all-MaxValue signature. At scale this turns the
    * signature stage into a pure scan projection: the 1000×-decade
    * cold path previously built and spilled a corpus-sized
    * array<long> column only for MinHashSig to fold it away. */
  def minHashText(text: UTF8String, n: Int, numPerms: Int, seed: Long): ArrayData = {
    val (as, bs) = perms(numPerms, seed)
    val out = Array.fill(numPerms)(Long.MaxValue)
    val bytes = text.getBytes
    var words = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') words += 1; i += 1 }
    if (words < n || bytes.length == 0) return new GenericArrayData(out)
    val starts = new Array[Int](words)
    var w = 1
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val count = words - n + 1
    var k = 0
    while (k < count) {
      val from = starts(k)
      val until = if (k + n < words) starts(k + n) - 1 else bytes.length
      val h = math.floorMod(XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L), P)
      var p = 0
      while (p < numPerms) {
        val v = (h * as(p) + bs(p)) % P
        if (v < out(p)) out(p) = v
        p += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  // hyperplane matrices per (bits, dim, seed), built once per JVM —
  // the same plan-time-literal discipline as the LSH hyperplanes and
  // the minhash permutations (deterministic, engine-independent)
  private val planesCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Double]]()

  private def planes(bits: Int, dim: Int, seed: Long): Array[Double] =
    planesCache.computeIfAbsent((bits, dim, seed), { case (b, d, sd) =>
      val rng = new scala.util.Random(sd)
      Array.fill(b * d)(rng.nextDouble() * 2 - 1) // row-major, plane-major
    })

  /** Sign-LSH signature of a double vector: bit (bits-1-p) is set when
    * plane p's dot product is positive. One pass over the vector per
    * plane, left-to-right IEEE order (DotProduct's contract), so the
    * result is bit-identical to the composed
    * `when(DotProduct(v, plane_p) > 0, 1L << (bits-1-p))` chain it
    * replaces — without the 64-branch codegen tree.
    *
    * `dim` is part of the signature's CONTRACT, not inferred per row:
    * hashing each row against a plane matrix derived from its own
    * length would silently make mixed-length vectors incomparable
    * (different planes -> different bit meanings) — a truncated
    * embedding must surface as an error, never as a plausible sig. */
  def signBits(v: ArrayData, bits: Int, dim: Int, seed: Long): Long = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"sign_bits_sig: vector of length ${v.numElements()} does not " +
          s"match the declared dim=$dim — mixed-length vectors would hash " +
          "against different hyperplane matrices and be incomparable")
    val pl = planes(bits, dim, seed)
    var sig = 0L
    var p = 0
    while (p < bits) {
      var d = 0.0
      var i = 0
      val off = p * dim
      while (i < dim) { d += v.getDouble(i) * pl(off + i); i += 1 }
      if (d > 0) sig |= 1L << (bits - 1 - p)
      p += 1
    }
    sig
  }

  /** SimHash signature: sign bits of per-bit +-1 votes. */
  def simHash(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

case class MinHashSig(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<bigint>, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    SketchSigs.minHash(input.asInstanceOf[ArrayData], numPerms, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.SketchSigs.minHash($c, $numPerms, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(hashes: Column, numPerms: Int, seed: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(hashes),
        numPerms, seed))
}

/** 64-bit (or narrower) sign-LSH signature over an array<double>
  * column — the embedding-space sibling of SimHashSig. Hyperplanes
  * are a pure function of (bits, dim, seed), generated once per JVM:
  * the signature is a narrow codegen projection, never a per-row
  * hash chain or a 64-branch CASE tree. `dim` is declared by the
  * caller and validated against every row (see SketchSigs.signBits):
  * a mixed-length vector column is a data bug, not a hashable input. */
case class SignBitsSig(child: Expression, bits: Int, dim: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _)
      if bits >= 1 && bits <= 64 && dim >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_bits_sig needs (array<double>, 1 <= bits <= 64, dim >= 1), " +
        s"got $t, bits=$bits, dim=$dim")
  }
  override def nullSafeEval(input: Any): Any =
    SketchSigs.signBits(input.asInstanceOf[ArrayData], bits, dim, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.SketchSigs.signBits($c, $bits, $dim, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): SignBitsSig =
    copy(child = newChild)
}

object SignBitsSig {
  def apply(v: Column, bits: Int, dim: Int, seed: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SignBitsSig(org.apache.spark.sql.graft.ColumnBridge.expression(v),
        bits, dim, seed))
}

/** Fused text → MinHash signature — see [[SketchSigs.minHashText]].
  * Replaces the MinHashSig(ShingleHashes(text)) composition on paths
  * that need ONLY the signature (candidate generation): the shingle
  * array column disappears from the plan entirely, so the signature
  * stage is a narrow scan projection with zero per-row allocation
  * beyond the 64-long output. Paths that also exact-verify still
  * compute ShingleHashes once (the verification currency). */
case class MinHashTextSig(child: Expression, n: Int, numPerms: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_text_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 && numPerms >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_text_sig needs (string, n >= 1, numPerms >= 1), got $t")
  }
  override def nullSafeEval(input: Any): Any =
    SketchSigs.minHashText(input.asInstanceOf[UTF8String], n, numPerms, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.SketchSigs.minHashText($c, $n, $numPerms, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashTextSig =
    copy(child = newChild)
}

object MinHashTextSig {
  def apply(text: Column, n: Int, numPerms: Int, seed: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashTextSig(org.apache.spark.sql.graft.ColumnBridge.expression(text),
        n, numPerms, seed))
}

case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_sig needs array<bigint>, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    SketchSigs.simHash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SketchSigs.simHash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def apply(hashes: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(hashes)))
}
