package graft.scale

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Pre-shuffle Bloom pruning for selective equi-joins — the runtime
  * row filter that keeps a 100 TB probe side from shuffling rows that
  * cannot possibly match (Spark's own runtime bloom join applies the
  * same idea when statistics let it; this is the explicit, always-on
  * form a pipeline can pin).
  *
  * Mechanics, fully distributed (no driver collect anywhere):
  *  1. the build side's keys fold into ONE bitset via a map-side-
  *     combinable Aggregator (k bits per key, Kirsch–Mitzenmacher
  *     double hashing over two xxhash64 draws);
  *  2. the 1-row bitset broadcasts onto the probe side with a
  *     crossJoin — Catalyst plans a BroadcastNestedLoopJoin whose
  *     build side is a single row;
  *  3. the membership test is pure built-in column arithmetic
  *     (element_at / shiftrightunsigned / bitwise and), so it runs
  *     inside whole-stage codegen and lands BEFORE any exchange the
  *     subsequent join needs.
  *
  * No false negatives ever (build and probe compute identical bit
  * positions), so `prune(probe).join(build)` equals
  * `probe.join(build)` row-for-row; false positives only waste the
  * shuffle the real join pays anyway. With m bits / n keys / k probes
  * the FP rate is (1 - e^{-kn/m})^k — the default 1 Mi bits keeps it
  * under 1% past 100k build keys, and the bitset broadcast is 128 KiB
  * regardless of build-side row width.
  */
object BloomJoin {

  /** OR-folds k bit positions per input (h1, h2) hash pair into a
    * fixed bitset. Commutative + associative => map-side combinable. */
  class BloomAgg(numBits: Int, k: Int)
      extends Aggregator[(Long, Long), Array[Long], Seq[Long]]
      with Serializable {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")

    override def zero: Array[Long] = new Array[Long](numBits / 64)

    override def reduce(buf: Array[Long], h: (Long, Long)): Array[Long] = {
      // reduce mod m BEFORE combining: (h1 + i*h2) mod m == (a + i*b)
      // mod m, and the small operands can't overflow — the probe side
      // must mirror this exactly (ANSI mode forbids wrapping arithmetic
      // there, so wrap-around semantics are not an option here either)
      val a = math.floorMod(h._1, numBits.toLong)
      val b = math.floorMod(h._2, numBits.toLong)
      var i = 0
      while (i < k) {
        val pos = ((a + i.toLong * b) % numBits.toLong).toInt
        buf(pos >> 6) |= (1L << (pos & 63))
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** The two independent 64-bit draws both sides derive positions
    * from. Seeds are column content only — deterministic across task
    * retries (the SkewJoin lesson: never salt/hash with run state). */
  private def hashes(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit(0x9E3779B9L)))

  /** Returns `probe` minus rows whose `probeKey` is provably absent
    * from `build`'s `buildKey` set. Semantically transparent before an
    * inner/semi join on the same keys. */
  def prune(probe: DataFrame, probeKey: Column,
            build: DataFrame, buildKey: Column,
            numBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    // xxhash64 is TYPE-sensitive (IntegerType hashes its 4 bytes,
    // LongType its 8), so an int-vs-bigint key pair would set and
    // probe DIFFERENT bit positions while the later equi-join still
    // matches through implicit casts — silently pruning true matches.
    // Fail fast instead of breaking the no-false-negatives contract;
    // the caller casts one side explicitly.
    val pt = probe.select(probeKey).schema.head.dataType
    val bt = build.select(buildKey).schema.head.dataType
    require(pt == bt,
      s"BloomJoin.prune: probe key type $pt != build key type $bt — " +
        "hash positions would diverge; cast the keys to one type first")
    val (bh1, bh2) = hashes(buildKey)
    val tupleEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    val bits = build.select(bh1.as("h1"), bh2.as("h2")).as(tupleEnc)
      .select(new BloomAgg(numBits, k).toColumn.name("__graft_bloom_bits"))
    val (ph1, ph2) = hashes(probeKey)
    // k membership probes, AND-folded: all-builtin => codegen'd.
    // call_function: the SQL shift functions take column shift
    // amounts; the Scala wrappers only accept Int literals.
    val pa = pmod(ph1, lit(numBits.toLong))
    val pb = pmod(ph2, lit(numBits.toLong))
    val pass = (0 until k).map { i =>
      val pos = pmod(pa + lit(i.toLong) * pb, lit(numBits.toLong))
      val word = call_function("shiftright", pos, lit(6)).cast("int") + 1
      val bit = (pos % 64).cast("int")
      (call_function("shiftrightunsigned",
        element_at(col("__graft_bloom_bits"), word), bit) bitwiseAND 1L) === 1L
    }.reduce(_ && _)
    probe.crossJoin(broadcast(bits)).filter(pass).drop("__graft_bloom_bits")
  }
}
