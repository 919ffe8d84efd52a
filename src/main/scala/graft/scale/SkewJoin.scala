package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (builder brief / SURVEY §7.4 risk
  * 6). AQE's skew-join handling (default-on) splits oversized
  * SortMergeJoin partitions at runtime; explicit salting is the
  * plan-level tool for the cases AQE can't fix — e.g. a single
  * heavy-hitter key that must still co-locate with a non-broadcastable
  * build side.
  *
  * Mechanics: the probe (fact) side gets a deterministic salt in
  * [0, salt); the build (dim) side is replicated `salt` times; the join
  * key becomes (key, salt), spreading one hot key over `salt`
  * partitions. Row multiplicity is unchanged — each fact row matches
  * exactly the one build replica carrying its salt.
  */
object SkewJoin {

  /** @param fact probe side (large, possibly skewed on `key`)
    * @param dim  build side (replicated `salt` times — keep it the
    *             smaller input)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // deterministic spread: hash the key itself plus a per-row nonce
    // derived from all columns, so identical hot-key rows still fan out
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(col("*")), monotonically_increasing_id()), lit(salt))
        .cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedFact
      .join(saltedDim, saltedFact(key) === saltedDim(key) &&
        saltedFact("__salt") === saltedDim("__salt"), joinType)
      .drop(saltedDim(key)).drop("__salt")
  }
}
