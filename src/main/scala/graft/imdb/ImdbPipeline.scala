package graft.imdb

import graft.expr.GraftFunctions
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end IMDB classifier pipeline (SURVEY.md §3.1 stages 1-5),
  * mirroring the reference's runner.py arg surface in [[Config]] and
  * ClassifierPipeline.run in [[run]], with every driver-side escape
  * replaced by a distributed operator (X1-X3 fixes).
  */
object ImdbPipeline {

  /** runner.py:53-104 argument surface. `extraCsv` is optional — the
    * TMDB dump is git-ignored in the reference (SURVEY §7.4 risk 4). */
  case class Config(
    trainGlob: String,
    testCsv: String,
    writingJson: String,
    directingJson: String,
    cacheCsv: String,
    resultsDir: String,
    extraCsv: Option[String] = None,
    modelDir: Option[String] = None,
    numTrees: Int = 300,
    batchSize: Int = 20,
    legacyScaler: Boolean = false,
    predictor: Enrichment.GenrePredictor = Enrichment.StubPredictor)

  /** Stage 2: preprocess one movie set (classifier_pipeline.py:162-208):
    * title normalization (distributed, replaces X1), numeric casts,
    * year repair. */
  def preprocess(df: DataFrame): DataFrame = {
    val cleaned = Cleaning.fillTitles(df)
      .withColumn("primaryTitle", Cleaning.normalizeTitle(col("primaryTitle")))
      .withColumn("originalTitle", Cleaning.normalizeTitle(col("originalTitle")))
    Cleaning.repairYears(Cleaning.numericCasts(cleaned))
  }

  /** Stage 3 for one set: metadata merge + genre enrichment + decade +
    * extra-data columns (classifier_pipeline.py:320-410). */
  private def engineer(spark: SparkSession, df: DataFrame, writing: DataFrame,
                       directing: DataFrame, cache: DataFrame, cfg: Config,
                       extra: Option[DataFrame]): (DataFrame, DataFrame) = {
    val merged = Metadata.mergeMetadata(df, writing, directing)
    val (genres, fresh) =
      Enrichment.enrich(spark, merged, cache, cfg.predictor, cfg.batchSize)
    val withGenre = merged
      .join(broadcast(genres), Seq("tconst"), "left") // J3
      .withColumn("genre", coalesce(col("genre"), lit("unknown")))
    val withExtra = extra match {
      case Some(e) =>
        // J4 + SURVEY §7.4 risk 5: dedup the non-unique imdb_id side
        withGenre.join(broadcast(e.dropDuplicates("tconst")), Seq("tconst"), "left")
      case None =>
        withGenre.withColumn("popularity", lit(0.0))
          .withColumn("budget", lit(0.0)).withColumn("revenue", lit(0.0))
    }
    (Features.withDecade(withExtra).drop("startYear", "endYear"), fresh)
  }

  /** Full run: load -> preprocess -> engineer -> train -> predict ->
    * sinks. Returns the prediction DataFrame (tconst, prediction). */
  def run(spark: SparkSession, cfg: Config): DataFrame = {
    GraftFunctions.register(spark)

    // Stage 1: load (S1-S4, S6)
    val train = Readers.loadTrain(spark, cfg.trainGlob)
    val test = Readers.loadTest(spark, cfg.testCsv)
    val writing = Readers.loadWriting(spark, cfg.writingJson)
    val directing = Readers.loadDirecting(spark, cfg.directingJson)
    val cache = Readers.loadGenreCache(spark, cfg.cacheCsv)
    val extra = cfg.extraCsv.map { p =>
      spark.read.option("header", true).option("inferSchema", true).csv(p)
        .withColumnRenamed("imdb_id", "tconst")
        .select(col("tconst"), col("budget").cast("double"),
          col("revenue").cast("double"), col("popularity").cast("double"))
    }

    // Stage 2: preprocess; means once, from train (R2)
    val trainPre = preprocess(train)
    val testPre = preprocess(test)
    val means =
      Cleaning.columnMeans(trainPre.filter(col("runtimeMinutes") > 0.0)
        .unionByName(testPre.withColumn("label", lit(null).cast("boolean")))
        .filter(col("runtimeMinutes") > 0.0),
        Seq("runtimeMinutes", "numVotes"))

    // Stage 3: features (fit-on-train indexers + scaler)
    val (trainFeat0, freshTrain) =
      engineer(spark, Cleaning.patchWithMean(trainPre, means),
        writing, directing, cache, cfg, extra)
    val (testFeat0, _) =
      engineer(spark, Cleaning.patchWithMean(testPre, means),
        writing, directing, cache.union(freshTrain), cfg, extra)
    val indexers = Features.fitIndexers(trainFeat0)
    val trainIdx = Features.applyIndexers(trainFeat0, indexers)
      .withColumn("label", col("label").cast("double"))
    val testIdx = Features.applyIndexers(testFeat0, indexers)
    val trainAsm = Features.assemble(trainIdx)
    val scaler = Features.fitScaler(trainAsm)
    val trainScaled = Features.scale(trainAsm, scaler, cfg.legacyScaler)
    val testScaled =
      Features.scale(Features.assemble(testIdx), scaler, cfg.legacyScaler)

    // Stages 4-5: train, predict, emit (K3 model sink + K1 predictions)
    val model: PipelineModel = ImdbModel.train(trainScaled, cfg.numTrees)
    cfg.modelDir.foreach(d => model.write.overwrite().save(d)) // K3
    val preds = ImdbModel.predict(model, testScaled)
      .select(col("tconst"), col("prediction"))
    Writers.savePredictionsTxt(preds, s"${cfg.resultsDir}/predictions")
    preds
  }
}
