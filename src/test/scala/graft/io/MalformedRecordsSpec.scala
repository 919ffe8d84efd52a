package graft.io

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Parse-mode contract of the text sources (CSV/JSON): a 100 TB
  * ingest ALWAYS contains broken rows, and the three modes are the
  * operator surface that decides their fate — PERMISSIVE nulls the
  * bad fields and captures the raw line in the corrupt-record column
  * (quarantine-table pattern), DROPMALFORMED silently filters,
  * FAILFAST aborts the job. The reference never handles this (its
  * inferSchema CSVs are trusted); an engine for arbitrary corpora
  * must. */
class MalformedRecordsSpec extends SparkSpec {

  private def writeLines(name: String, lines: Seq[String]): String = {
    val d = Files.createTempDirectory("graft_malformed")
    val f = d.resolve(name)
    Files.write(f, String.join("\n", lines: _*).getBytes)
    f.toString
  }

  private val csvPath = writeLines("rows.csv", Seq(
    "id,qty,price",
    "1,10,1.5",
    "2,not_a_number,2.5", // qty unparsable
    "3,30,3.5"))

  private val csvSchema = StructType(Seq(
    StructField("id", LongType), StructField("qty", LongType),
    StructField("price", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("CSV PERMISSIVE: bad field nulled, raw line quarantined") {
    val df = spark.read.option("header", true).option("mode", "PERMISSIVE")
      .schema(csvSchema).csv(csvPath).cache()
    assert(df.count() == 3)
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[Long]("id") == 2L)
    assert(bad.head.isNullAt(bad.head.fieldIndex("qty")))
    assert(bad.head.getAs[String]("_corrupt_record").contains("not_a_number"))
  }

  test("CSV DROPMALFORMED: malformedness follows column pruning") {
    // The drop rule, pinned because it is surprising and documented
    // only in passing: a CSV record is malformed when a REQUESTED
    // column fails to parse. Column pruning therefore changes which
    // rows exist — project away the damaged column and the row
    // survives; read it and the row is dropped. A 100 TB ingest doing
    // `select(id).count()` and a full-schema quality audit can
    // legitimately disagree on the row count of the same file.
    val p = writeLines("arity.csv", Seq(
      "id,qty,price", "1,10,1.5", "2,not_a_number,2.5", "3,30,3.5"))
    val df = spark.read.option("header", true).option("mode", "DROPMALFORMED")
      .schema(StructType(csvSchema.dropRight(1))).csv(p)
    // pruned projection: the damaged qty is never parsed -> row kept
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // full projection parses qty -> the record is malformed -> dropped
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("JSON DROPMALFORMED: syntax-broken lines removed") {
    val p = writeLines("drop.json", Seq(
      """{"id": 1}""", """{"id": """, """{"id": 3}"""))
    val df = spark.read.option("mode", "DROPMALFORMED")
      .schema(StructType(Seq(StructField("id", LongType)))).json(p)
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("CSV FAILFAST: first bad row aborts the read") {
    val df = spark.read.option("header", true).option("mode", "FAILFAST")
      .schema(StructType(csvSchema.dropRight(1))).csv(csvPath)
    assertThrows[SparkException](df.collect())
  }

  test("corrupt parquet file: fail-fast by default, skippable by conf") {
    val d = Files.createTempDirectory("graft_corrupt")
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("id").write.parquet(d.resolve("good").toString)
    // a second "parquet" file that is garbage bytes
    val bad = d.resolve("good").resolve("part-corrupt.parquet")
    Files.write(bad, Array.fill[Byte](256)(0x42))
    val path = d.resolve("good").toString
    // default: the scan fails loudly (no silent data loss)
    assertThrows[org.apache.spark.SparkException](
      spark.read.parquet(path).collect())
    // opt-in skip: quarantine-style reads for a corpus with known rot
    val lax = spark.newSession()
    lax.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    val ids = lax.read.parquet(path).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("JSON PERMISSIVE captures unparsable lines") {
    val p = writeLines("rows.json", Seq(
      """{"id": 1, "name": "a"}""",
      """{"id": 2, "name": }""", // syntax error
      """{"id": 3, "name": "c"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema).json(p).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("name") === "c").count() == 1)
  }
}
