package graft.queries

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.functions._

/** A5 EDA parity (eda/data_analysis.ipynb cells 3-12): summary(),
  * MLlib correlation matrix vs df.stat.corr, skewness built-in. */
class EdaSpec extends SparkSpec {

  test("MLlib Correlation matrix agrees with df.stat.corr pairwise") {
    val li = Tables(spark, sf("sf0.001"), "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("l_quantity", "l_extendedprice", "l_discount"))
      .setOutputCol("v").transform(li)
    val m = Correlation.corr(assembled, "v").head().getAs[Matrix](0)
    val pairwise = li.stat.corr("l_quantity", "l_extendedprice")
    assert(math.abs(m(0, 1) - pairwise) < 1e-9)
    assert(math.abs(m(0, 0) - 1.0) < 1e-12)
  }

  test("summary() exposes describe()-style stats") {
    val s = Tables(spark, sf("sf0.001"), "orders")
      .select(col("o_totalprice")).summary("count", "mean", "min", "max")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(s("count") == "1500")
    assert(s("mean").toDouble > 0)
  }

  test("skewness/kurtosis built-ins run distributed") {
    val r = Tables(spark, sf("sf0.001"), "lineitem")
      .agg(skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku")).head()
    // l_quantity is ~uniform: near-zero skew, platykurtic
    assert(math.abs(r.getDouble(0)) < 0.2)
    assert(r.getDouble(1) < 0)
  }
}
