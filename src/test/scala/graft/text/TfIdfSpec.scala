package graft.text

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {

  test("tf-idf: stopwords vanish, rare terms outweigh common ones") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val model = TfIdf.fit(docs)
    val out = TfIdf.transform(docs, model)
    assert(out.count() == 500)
    // stopword removal happened
    val filtered = out.select("filtered").head().getSeq[String](0)
    assert(!filtered.contains("the") && !filtered.contains("a"))
    // tfidf vectors are non-trivial and sparse in the hash space
    val v = out.select("tfidf").head().getAs[Vector](0)
    assert(v.numNonzeros > 0 && v.numNonzeros < v.size)
  }

  test("MLlib BucketedRandomProjectionLSH finds near neighbors (alt ANN path)") {
    import spark.implicits._
    val e = Tables(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) => (id, Vectors.dense(emb.map(_.toDouble).toArray)) }
      .toDF("vec_id", "features")
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(4).setSeed(42)
    val model = lsh.fit(e)
    val q = e.filter(col("vec_id") === 0).head().getAs[Vector](1)
    val nn = model.approxNearestNeighbors(e, q, 5).select("vec_id")
      .as[Long].collect()
    assert(nn.length == 5)
    assert(nn.contains(0L),
      "the query vector itself must be its own nearest neighbor")
  }
}
