package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution across parquet file generations — the source
  * capability a long-lived 100 TB table needs: files written before a
  * column existed must stay readable next to files written after.
  * mergeSchema unions the per-file schemas (absent columns → null);
  * the default fast path trusts the first footer, which is the right
  * production setting once the table schema is pinned in a catalog. */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unions generations; old files read null for new cols") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("schema_evo").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "c", 9.5), (4L, "d", 7.0)).toDF("id", "name", "score")
      .write.parquet(s"$dir/gen=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("gen", "id", "name", "score"))
    // old generation: score is null, not an error
    assert(merged.filter($"gen" === 1 && $"score".isNull).count() == 2)
    assert(merged.filter($"gen" === 2).agg(sum($"score")).first()
      .getDouble(0) == 16.5)
  }

  test("added column is filterable with correct null semantics") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("schema_evo2").toString
    Seq(Tuple1(1L)).toDF("id").write.parquet(s"$dir/p=old")
    Seq((2L, "en")).toDF("id", "lang").write.parquet(s"$dir/p=new")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    // three-valued logic: null lang matches neither = nor <>
    assert(df.filter($"lang" === "en").count() == 1)
    assert(df.filter($"lang" =!= "en").count() == 0)
    assert(df.filter($"lang".isNull).count() == 1)
  }
}
