package graft.imdb

import graft.SparkSpec

class MetadataSpec extends SparkSpec {

  test("topEntityPerMovie: picks most frequent, deterministic tie-break") {
    import spark.implicits._
    // w1 appears 2x globally, w2 2x, w3 1x. m1 has {w1, w3}: w1 wins.
    // m2 has {w1, w2} -> tie on count 2 -> lexicographic asc -> w1.
    val pairs = Seq(
      ("m1", "w1"), ("m1", "w3"),
      ("m2", "w1"), ("m2", "w2"),
      ("m3", "w2")).toDF("movie", "writer")
    val top = Metadata.topEntityPerMovie(pairs, "writer")
      .select("movie", "writer", "writer_count")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(top == Seq(("m1", "w1", 2L), ("m2", "w1", 2L), ("m3", "w2", 2L)))
  }

  test("mergeMetadata: left joins keep all movies, null -> 'unknown'") {
    import spark.implicits._
    val movies = Seq(("tt1", "A"), ("tt2", "B")).toDF("tconst", "title")
    val writing = Seq(("tt1", "w1")).toDF("movie", "writer")
    val directing = Seq(("tt1", "d1")).toDF("movie", "director")
    val out = Metadata.mergeMetadata(movies, writing, directing)
      .select("tconst", "writer", "director")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(out == Seq(("tt1", "w1", "d1"), ("tt2", "unknown", "unknown")))
  }
}
