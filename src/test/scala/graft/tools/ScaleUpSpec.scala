package graft.tools

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ScaleUp must produce an EXACT ×N replica: linear row growth,
  * referential integrity (no orphan foreign keys — copy i of lineitem
  * joins copy i of orders/part/supplier and nothing else), verbatim
  * fixed dims, unchanged schema/key types (the driver gate's hash is
  * type-sensitive), and determinism (two runs byte-agree on values).
  * This is the generator behind the sf1 relational gate
  * (bench/sf1_gate_r9.txt), so its contract needs its own pin. */
class ScaleUpSpec extends SparkSpec {

  test("x3 replica: counts, integrity, fixed dims, types, determinism") {
    val in = sf("sf0.001")
    val out = Files.createTempDirectory("graft_scaleup").toString
    ScaleUp.writeTier(spark, in, out, factor = 3)

    def cnt(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    // scalable tables grow exactly x3
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(cnt(out, t) == 3 * cnt(in, t), s"$t not exactly x3")
    // fixed dims are verbatim copies
    for (t <- Seq("region", "nation"))
      assert(spark.read.parquet(s"$out/$t.parquet").exceptAll(
        spark.read.parquet(s"$in/$t.parquet")).isEmpty, s"$t drifted")

    // referential integrity: every lineitem FK resolves, and the join
    // cardinality is exactly linear (each replica joins only its own
    // copy — a wrong offset would cross-join replicas)
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val o = spark.read.parquet(s"$out/orders.parquet")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .count() == 0, "orphan lineitem orderkeys")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      == 3 * cnt(in, "lineitem"), "join cardinality not linear")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    val ordIn = spark.read.parquet(s"$in/orders.parquet")
    assert(spark.read.parquet(s"$out/orders.parquet")
      .join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
      .count() == ordIn.join(
        spark.read.parquet(s"$in/customer.parquet"),
        col("o_custkey") === col("c_custkey"), "left_anti").count() * 3,
      "customer FK orphan count not linear (offsets disagree)")

    // schema and key types unchanged (type-sensitive driver hash)
    for (t <- Seq("orders", "lineitem", "customer", "events")) {
      val sIn = spark.read.parquet(s"$in/$t.parquet").schema
      val sOut = spark.read.parquet(s"$out/$t.parquet").schema
      assert(sIn == sOut, s"$t schema drifted:\n in=$sIn\nout=$sOut")
    }

    // doc/vec id domains stay DENSE 0..3n-1 and below PlantedOffset —
    // the dedup/kmeans family's id contract (planted twins derive as
    // id + offset; kmeans seeding reads ids as positions)
    for (t <- Seq("documents" -> "doc_id", "embeddings" -> "vec_id")) {
      val ids = spark.read.parquet(s"$out/${t._1}.parquet")
      val n = ids.count()
      val mx = ids.agg(max(col(t._2))).head().getLong(0)
      assert(mx == n - 1, s"${t._1} ids not dense: max=$mx n=$n")
      assert(mx < graft.queries.DedupPack.PlantedOffset)
    }

    // determinism: a second run produces the identical orders table
    val out2 = Files.createTempDirectory("graft_scaleup2").toString
    ScaleUp.writeTier(spark, in, out2, factor = 3)
    assert(spark.read.parquet(s"$out/orders.parquet").exceptAll(
      spark.read.parquet(s"$out2/orders.parquet")).isEmpty,
      "ScaleUp is not deterministic")
  }

  /** Copy the sf0.001 tier into a temp dir so one table can be
    * rewritten with a pathological shape. */
  private def copyTier(): String = {
    val dir = Files.createTempDirectory("graft_scaleup_in").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      Files.copy(java.nio.file.Paths.get(sf("sf0.001"), s"$t.parquet"),
        java.nio.file.Paths.get(dir, s"$t.parquet"))
    dir
  }

  test("a factor that would wrap an int-typed key fails loudly") {
    val in = copyTier()
    // int32 event_id near Int.MaxValue/2: base*3-1 exceeds Int.MaxValue,
    // and the non-ANSI cast back to int would otherwise WRAP silently,
    // colliding keys across replicas (ADVICE r9 / VERDICT r9 item 3)
    spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .withColumn("event_id",
        when(col("event_id") === 0, lit(800000000))
          .otherwise(col("event_id")).cast("int"))
      .write.mode("overwrite").parquet(s"$in/events.parquet")
    val out = Files.createTempDirectory("graft_scaleup_of").toString
    val e = intercept[IllegalArgumentException] {
      ScaleUp.writeTier(spark, in, out, factor = 3)
    }
    assert(e.getMessage.contains("wrap"), s"wrong failure: ${e.getMessage}")
  }

  test("an empty domain table fails loudly, not with an opaque NPE") {
    val in = copyTier()
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    docs.filter(lit(false)).write.mode("overwrite")
      .parquet(s"$in/documents.parquet")
    val out = Files.createTempDirectory("graft_scaleup_empty").toString
    val e = intercept[IllegalArgumentException] {
      ScaleUp.writeTier(spark, in, out, factor = 2)
    }
    assert(e.getMessage.contains("empty"), s"wrong failure: ${e.getMessage}")
  }

  test("domain base covers orphan FKs larger than the parent max key") {
    val in = copyTier()
    // plant one orders row whose o_custkey EXCEEDS customer's max key:
    // a parent-only base would alias it into replica 1's customer
    // range after offsetting (ADVICE r9) — with the FK-inclusive base
    // the orphan must stay an orphan in every replica
    val cmax = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .agg(max(col("c_custkey"))).head().getLong(0)
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    val omax = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    orders.limit(1)
      .withColumn("o_orderkey", lit(omax + 1))
      .withColumn("o_custkey", lit(cmax + 7))
      .unionByName(orders)
      .write.mode("overwrite").parquet(s"$in/orders.parquet")
    val out = Files.createTempDirectory("graft_scaleup_fk").toString
    ScaleUp.writeTier(spark, in, out, factor = 3)
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    val orphanIn = spark.read.parquet(s"$in/orders.parquet")
      .join(spark.read.parquet(s"$in/customer.parquet"),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
      .count() == 3 * orphanIn,
      "orphan FK aliased into another replica's parent range")
  }
}
