package graft.text

import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.DataFrame

/** MLlib text-analysis pipeline (SURVEY §7.2 step 5): tokenize ->
  * stopword removal -> hashed term frequencies -> IDF weighting. The
  * standard distributed featurization for document-scale corpora:
  * HashingTF needs no vocabulary broadcast (fixed hash space), IDF is
  * one aggregation over the corpus — both linear, shuffle-light.
  */
object TfIdf {

  case class Model(idf: IDFModel, numFeatures: Int)

  private def stages(numFeatures: Int) = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\s+")
    val stop = new StopWordsRemover()
      .setInputCol("tokens").setOutputCol("filtered")
      .setStopWords(Array("the", "a"))
    val tf = new HashingTF()
      .setInputCol("filtered").setOutputCol("tf")
      .setNumFeatures(numFeatures)
    (tok, stop, tf)
  }

  /** Fit IDF on a corpus with a `text` column. */
  def fit(corpus: DataFrame, numFeatures: Int = 1 << 12): Model = {
    val (tok, stop, tf) = stages(numFeatures)
    val tfDf = tf.transform(stop.transform(tok.transform(corpus)))
    Model(new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tfDf),
      numFeatures)
  }

  /** Apply: adds tokens/filtered/tf/tfidf columns. */
  def transform(df: DataFrame, model: Model): DataFrame = {
    val (tok, stop, tf) = stages(model.numFeatures)
    model.idf.transform(tf.transform(stop.transform(tok.transform(df))))
  }
}
