package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity-preserving N× replication of a driver
  * testdata tier — the sf1 gate generator (VERDICT r8 item 7: the
  * oracle gate stopped at sf0.1 while scale evidence was bench-only;
  * this raises the RELATIONAL gate a full tier).
  *
  * Method: each scalable table is replicated `factor` times by an
  * `explode(sequence(...))` copy index — a NARROW op, no shuffle, no
  * driver loop — with every key column in a scaled key DOMAIN offset
  * by `copy * base(domain)`, where base = (max key over the domain's
  * owning table) + 1, computed once per domain. Foreign keys use the
  * SAME base as their referenced primary key, so every join
  * cardinality scales exactly linearly: copy i of lineitem joins copy
  * i of orders/part/supplier and nothing else. Fixed dimensions
  * (region, nation) are copied verbatim — as in TPC-H, where dims are
  * SF-invariant — so nationkey/regionkey references stay valid without
  * offsetting. Dates, timestamps and measure columns are unchanged:
  * per-group aggregates grow ×factor in contributing rows while
  * group-key domains (dates, flags, segments) stay fixed, which is the
  * TPC-H growth shape the sql_* rows are meant to see.
  *
  * DuckDB gates the OUTPUT of each query over the same parquet, so the
  * replica corpus needs no external truth — only determinism (it is:
  * the copy index is the only new value) and linear referential
  * growth.
  *
  * Usage: runMain graft.tools.ScaleUp <inDir> <outDir> <factor>
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    writeTier(spark, inDir, outDir, factor)
    spark.stop()
  }

  /** Key domains: domain -> (owning table, key column). Foreign keys
    * below reference these bases so parent/child offsets agree. */
  private val domains = Seq(
    "cust" -> ("customer", "c_custkey"),
    "supp" -> ("supplier", "s_suppkey"),
    "part" -> ("part", "p_partkey"),
    "order" -> ("orders", "o_orderkey"),
    "event" -> ("events", "event_id"),
    "user" -> ("events", "user_id"),
    "doc" -> ("documents", "doc_id"),
    "vec" -> ("embeddings", "vec_id"))

  /** Per-table key columns and their domain. Columns not listed are
    * carried through unchanged. */
  private val keyCols: Map[String, Seq[(String, String)]] = Map(
    "customer" -> Seq("c_custkey" -> "cust"),
    "supplier" -> Seq("s_suppkey" -> "supp"),
    "part" -> Seq("p_partkey" -> "part"),
    "orders" -> Seq("o_orderkey" -> "order", "o_custkey" -> "cust"),
    "lineitem" -> Seq("l_orderkey" -> "order", "l_partkey" -> "part",
      "l_suppkey" -> "supp"),
    "events" -> Seq("event_id" -> "event", "user_id" -> "user"),
    "documents" -> Seq("doc_id" -> "doc"),
    "embeddings" -> Seq("vec_id" -> "vec"))

  def writeTier(spark: SparkSession, inDir: String, outDir: String,
                factor: Int): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val load = (t: String) => spark.read.parquet(s"$inDir/$t.parquet")
    // one tiny agg per domain table; base = max key + 1 EXACTLY — for
    // the dense-from-0 doc/vec id domains this tiles replicas into
    // 0..N·n-1, still dense, which the dedup/kmeans family's id
    // contract requires (planted twins are DERIVED as id +
    // PlantedOffset at query time, and KMeans' data-deterministic
    // seeding reads ids as positions; an earlier draft floored the
    // base at 20M "to be safe" and thereby pushed REAL replica ids
    // into the planted window — d_semdedup_scoped/s_kmeans failed
    // loudly at the sf1 gate). Guard the window explicitly instead.
    // one agg job per OWNING TABLE (events carries two domains — a
    // per-domain loop would scan it twice for two single-column maxes)
    val base: Map[String, Long] = domains.groupBy(_._2._1).toSeq
      .flatMap { case (tbl, doms) =>
        val row = load(tbl)
          .agg(doms.map { case (_, (_, c)) =>
            max(expr(c).cast("long")) }.head,
            doms.tail.map { case (_, (_, c)) =>
              max(expr(c).cast("long")) }: _*)
          .head()
        doms.zipWithIndex.map { case ((dom, _), i) =>
          dom -> (row.getLong(i) + 1L) }
      }.toMap
    for (dom <- Seq("doc", "vec")) {
      val top = base(dom) * factor - 1
      require(top < graft.queries.DedupPack.PlantedOffset,
        s"$dom ids would reach $top ≥ PlantedOffset " +
          s"(${graft.queries.DedupPack.PlantedOffset}) at x$factor — " +
          "replica ids would read as planted twins; raise the offset first")
    }
    // fixed dims copy verbatim; everything else replicates with offsets
    Seq("region", "nation").foreach { t =>
      load(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    keyCols.keys.toSeq.sorted.foreach { t =>
      replicate(load(t), keyCols(t).map { case (c, d) => c -> base(d) },
        factor)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      System.err.println(s"[scaleup] $t x$factor -> $outDir/$t.parquet")
    }
  }

  /** ×factor via an exploded copy index — narrow, no shuffle; key
    * columns keep their ORIGINAL integer type (the gate's hash is
    * type-sensitive, so a silent int->long widening would be a
    * schema drift, not a scale-up). */
  private def replicate(df: DataFrame, keys: Seq[(String, Long)],
                        factor: Int): DataFrame = {
    if (factor == 1) return df
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    val withCopy = df.withColumn("__copy",
      explode(sequence(lit(0), lit(factor - 1))))
    keys.foldLeft(withCopy) { case (d, (c, b)) =>
      d.withColumn(c,
        (col(c).cast("long") + col("__copy").cast("long") * lit(b))
          .cast(types(c)))
    }.drop("__copy")
  }
}
