package graft.imdb

import graft.SparkSpec

class WritersSpec extends SparkSpec {

  test("K2: cache merge — old entries win, dedup by tconst, header kept") {
    import spark.implicits._
    val old = Seq(("tt1", "Drama"), ("tt2", "War")).toDF("tconst", "genre")
    val fresh = Seq(("tt2", "Comedy"), ("tt3", "Horror")).toDF("tconst", "genre")
    val dir = java.nio.file.Files.createTempDirectory("graft_cache").toString
    Writers.saveGenreCache(old, fresh, s"$dir/cache")
    val back = Readers.loadGenreCache(spark, s"$dir/cache")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == Map("tt1" -> "Drama", "tt2" -> "War", "tt3" -> "Horror"),
      "old cache entries must win on conflict (reference dict-update order)")
  }

  test("K1: predictions sink writes one ordered True/False line per row") {
    import spark.implicits._
    val preds = Seq(("tt3", 0.0), ("tt1", 1.0), ("tt2", 0.0))
      .toDF("tconst", "prediction")
    val dir = java.nio.file.Files.createTempDirectory("graft_preds").toString
    Writers.savePredictionsTxt(preds, s"$dir/out")
    val txt = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".txt")).head
    val lines = scala.io.Source.fromFile(txt).getLines().toSeq
    assert(lines == Seq("True", "False", "False")) // tt1, tt2, tt3 order
  }
}
