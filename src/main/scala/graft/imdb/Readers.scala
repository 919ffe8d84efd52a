package graft.imdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources S1-S6 (SURVEY.md §2.1), Spark-first.
  *
  * Replaces the reference's driver-side escapes: the per-file glob +
  * iterative union (data_utils.py:122-157, X2) becomes one globbed
  * scan; the driver-side `json.load` + dict-intersection restructure of
  * directing.json (data_utils.py:67-100, R5) becomes a distributed
  * map-explode + inner join. Nothing here materializes rows on the
  * driver.
  */
object Readers {

  /** S1: CSV scan with explicit schema and `\N` null sentinel handled
    * by the reader (replaces the per-column `when` rewrite at
    * data_utils.py:239). */
  def loadCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", true)
      .option("nullValue", "\\N")
      .schema(schema)
      .csv(path)

  /** S2: multi-file train scan — Spark globs `train-*.csv` natively;
    * positional union semantics are what a multi-path scan does.
    * One job, no per-file driver loop. */
  def loadTrain(spark: SparkSession, globPath: String): DataFrame =
    loadCsv(spark, globPath, Schemas.train)

  def loadTest(spark: SparkSession, path: String): DataFrame =
    loadCsv(spark, path, Schemas.test)

  /** S3: writing.json — a one-line top-level JSON array parses to one
    * row per element (data_utils.py:48-64). */
  def loadWriting(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.writing).json(path)

  /** S4: directing.json columns-orient restructure, distributed.
    * The reference's Python dict-key intersection (`&` at
    * data_utils.py:91) IS an inner join on the index key — expressed
    * here as explode(map) x2 + join, no driver JSON parse. */
  def loadDirecting(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("multiLine", true)
      .schema(Schemas.directing)
      .json(path)
    val movies = raw.select(explode(col("movie")).as(Seq("idx", "movie")))
    val directors = raw.select(explode(col("director")).as(Seq("idx", "director")))
    movies.join(directors, "idx").select(col("movie"), col("director"))
  }

  /** S6: LLM genre cache — just a 2-column table; downstream uses joins
    * instead of the reference's driver dict lookups
    * (data_utils.py:378-389). Missing cache file -> empty frame. */
  def loadGenreCache(spark: SparkSession, path: String): DataFrame = {
    // globStatus, not exists: exists() is literal, so a GLOB cache
    // path ("{train,validation}_cache-csv", "cache-*.csv") used to
    // return FALSE and silently hand back an EMPTY cache — every
    // movie then went to the LLM at full cost with no error (caught
    // by the r12 ImdbScaleCensus gate: the stub's genres displaced
    // the cached ones). globStatus handles literal paths too.
    val exists = try {
      val p = new org.apache.hadoop.fs.Path(path)
      val matches = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .globStatus(p)
      matches != null && matches.nonEmpty
    } catch { case _: Exception => false }
    if (exists) loadCsv(spark, path, Schemas.genreCache)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.genreCache)
  }
}
