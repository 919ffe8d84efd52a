package graft.imdb

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.sql.DataFrame

/** M5-M7 + M9 (SURVEY.md §2.10): RandomForest train / predict /
  * importances / evaluation, hyperparameters pinned to the reference
  * (classifier_model.py:49-61).
  */
object ImdbModel {

  def classifier(numTrees: Int = 300): RandomForestClassifier =
    new RandomForestClassifier()
      .setFeaturesCol("scaled_features").setLabelCol("label")
      .setNumTrees(numTrees)
      .setMaxDepth(15)
      .setMinInstancesPerNode(2)
      .setMaxBins(64)
      .setImpurity("entropy")
      .setBootstrap(true)
      .setFeatureSubsetStrategy("sqrt")
      .setSubsamplingRate(0.8)
      .setSeed(42)

  /** M5: 1-stage ml.Pipeline fit, like classifier_model.py:95-112. */
  def train(trainDf: DataFrame, numTrees: Int = 300): PipelineModel =
    new Pipeline().setStages(Array(classifier(numTrees))).fit(trainDf)

  /** M6: adds rawPrediction/probability/prediction. */
  def predict(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df)

  /** M7: top-k (featureName, importance), driver-side on a tiny array
    * (classifier_model.py:75-93). */
  def topImportances(model: PipelineModel, names: Seq[String],
                     k: Int = 5): Seq[(String, Double)] = {
    val rf = model.stages.last.asInstanceOf[RandomForestClassificationModel]
    names.zip(rf.featureImportances.toArray).sortBy(-_._2).take(k)
  }

  /** M9: the reference's only self-evaluation recipe —
    * randomSplit(0.8/0.2, seed 42) + accuracy
    * (eda/process_data.ipynb cell 1). */
  def evaluateAccuracy(featurized: DataFrame, numTrees: Int = 100): Double = {
    val Array(tr, te) = featurized.randomSplit(Array(0.8, 0.2), 42)
    val model = train(tr, numTrees)
    new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("accuracy")
      .evaluate(predict(model, te))
  }
}
