package graft.imdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end golden test (SURVEY.md §5): full pipeline on the
  * reference's committed fixtures with the committed LLM cache (zero
  * predictor calls) — asserts the output contract and the reference's
  * own accuracy bar on its own evaluation recipe. Slow (~2 min): tagged
  * by name, runs in `sbt test`. */
class ImdbPipelineSpec extends SparkSpec {

  private val dir = "/root/reference/imdb"
  private def fixturesPresent = new java.io.File(s"$dir/train-1.csv").exists()

  test("full pipeline: validation predictions match the K1 contract") {
    assume(fixturesPresent)
    val out = java.nio.file.Files.createTempDirectory("graft_imdb").toString
    val cfg = ImdbPipeline.Config(
      trainGlob = s"$dir/train-*.csv",
      testCsv = s"$dir/validation_hidden.csv",
      writingJson = s"$dir/writing.json",
      directingJson = s"$dir/directing.json",
      cacheCsv = s"$dir/validation_gemma3_4b_cache.csv",
      resultsDir = out,
      numTrees = 60) // smaller forest: contract test, not accuracy test
    val preds = ImdbPipeline.run(spark, cfg)
    assert(preds.count() == 955)

    // K1 contract: one True/False per line, ordered by tconst; F9: the
    // default path is the timestamped {set}_{model}_{ts}.txt name
    val resultDirs = new java.io.File(out).listFiles()
      .filter(_.getName.matches("validation_stub_\\d{8}_\\d{6}\\.txt"))
    assert(resultDirs.length == 1, s"expected one timestamped result dir in $out")
    val txt = resultDirs.head.listFiles()
      .filter(_.getName.endsWith(".txt")).head
    val lines = scala.io.Source.fromFile(txt).getLines().toSeq
    assert(lines.length == 955)
    assert(lines.forall(l => l == "True" || l == "False"))

    // order contract: line i corresponds to sorted tconst i
    val sortedPreds = preds.orderBy("tconst")
      .select(when(col("prediction") === 1.0, "True").otherwise("False"))
      .collect().map(_.getString(0)).toSeq
    assert(lines == sortedPreds)

    // K2 contract: the run wrote an updated genre cache that GREW —
    // train-set ids are absent from the committed validation cache, so
    // the stub predictor's fresh rows must land in it
    val oldCacheSize = Readers.loadGenreCache(spark,
      s"$dir/validation_gemma3_4b_cache.csv").count()
    val newCache = Readers.loadGenreCache(spark, s"$out/genre_cache")
    assert(newCache.count() > oldCacheSize,
      "updated cache must contain the fresh stub predictions")
    assert(newCache.select("tconst").distinct().count() == newCache.count(),
      "cache must stay unique per tconst")
  }

  test("accuracy >= 0.75 on the reference's own 80/20 recipe") {
    assume(fixturesPresent)
    // Build train features exactly as the pipeline does, then evaluate
    // with the reference's prototype recipe (randomSplit 0.8/0.2 seed
    // 42, RF 100 trees — eda/process_data.ipynb cell 1).
    val spark0 = spark
    graft.expr.GraftFunctions.register(spark0)
    val train = ImdbPipeline.preprocess(Readers.loadTrain(spark0, s"$dir/train-*.csv"))
    val writing = Readers.loadWriting(spark0, s"$dir/writing.json")
    val directing = Readers.loadDirecting(spark0, s"$dir/directing.json")
    val cache = Readers.loadGenreCache(spark0, s"$dir/train_gemma3_4b_cache.csv")
    val means = Cleaning.columnMeans(train, Seq("runtimeMinutes", "numVotes"))
    val merged = Metadata.mergeMetadata(
      Cleaning.patchWithMean(train, means), writing, directing)
    val (genres, _) =
      Enrichment.enrich(spark0, merged, cache, Enrichment.StubPredictor)
    val withGenre = merged.join(broadcast(genres), Seq("tconst"), "left")
      .withColumn("genre", coalesce(col("genre"), lit("unknown")))
      .withColumn("popularity", lit(0.0))
      .withColumn("budget", lit(0.0)).withColumn("revenue", lit(0.0))
    val feat = Features.withDecade(withGenre).drop("startYear", "endYear")
    val indexers = Features.fitIndexers(feat)
    val idx = Features.applyIndexers(feat, indexers)
      .withColumn("label", col("label").cast("double"))
    val asm = Features.assemble(idx)
    val scaled = Features.scale(asm, Features.fitScaler(asm))
    val acc = ImdbModel.evaluateAccuracy(scaled, numTrees = 100)
    info(f"accuracy = $acc%.4f")
    assert(acc >= 0.75, f"accuracy $acc%.4f below the reference's 0.75 bar")
  }
}
