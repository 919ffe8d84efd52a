package graft.text

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  /** In-memory reference: same counting, same (cnt desc, a, b)
    * tie-break, same greedy left-to-right merge application. */
  private def referenceTrain(words: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, Long]) = {
    var syms: Map[List[String], Long] =
      words.groupMapReduce(w => w._1.split("").toList)(_._2)(_ + _)
    val merges = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      syms.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) += f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b, cnt))
        def merge(s: List[String]): List[String] =
          s.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc.init :+ (a + b)
            else acc :+ x
          }
        syms = syms.groupMapReduce(kv => merge(kv._1))(_._2)(_ + _)
      }
      r += 1
    }
    val vocab = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    syms.foreach { case (s, f) => s.foreach(sym => vocab(sym) += f) }
    (merges.result(), vocab.toMap)
  }

  test("classic fixture: merges follow pair frequency with ties broken") {
    import spark.implicits._
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val df = words.toSeq.toDF("word", "freq")
    val (merges, syms) = Bpe.train(df, 4)
    val (refMerges, refVocab) = referenceTrain(words, 4)
    assert(merges.map(m => (m.a, m.b, m.freq)) == refMerges)
    // "est" must emerge within 4 merges (9 weighted occurrences of
    // e-s and s-t dominate this fixture)
    assert(merges.exists(_.merged == "est"),
      s"expected an 'est' merge in ${merges.map(_.merged)}")
    val vocab = Bpe.vocab(syms).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == refVocab)
    syms.unpersist()
  }

  test("corpus words: 6 distributed merges equal the in-memory reference") {
    val words = Tables(spark, sf("sf0.001"), "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val wordMap = words.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (merges, syms) = Bpe.train(words, 6)
    val (refMerges, refVocab) = referenceTrain(wordMap, 6)
    assert(merges.map(m => (m.a, m.b, m.freq)) == refMerges,
      s"merge sequence diverged: ${merges.map(m => (m.a, m.b, m.freq))} " +
        s"vs $refMerges")
    val vocab = Bpe.vocab(syms).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == refVocab)
    // merges strictly grow symbol length; every merge was frequent
    merges.foreach { m =>
      assert(m.merged.length >= 2 && m.freq > 0)
    }
    syms.unpersist()
  }

  test("encode replays training: encoding the corpus == trained table") {
    import spark.implicits._
    val words = Tables(spark, sf("sf0.001"), "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val (merges, trained) = Bpe.train(words, 5)
    val encoded = Bpe.encode(words, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val ref = trained
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(encoded == ref,
      "replaying the merge list diverged from the training end state")
    // unseen word: encodes with the same merges, never throws
    val novel = Bpe.encode(Seq(("tablescan", 1L)).toDF("word", "freq"), merges)
      .select(col("s")).collect()(0).getSeq[String](0)
    assert(novel.mkString == "tablescan", "encode must preserve content")
    trained.unpersist()
  }

  test("randomized tiny-alphabet corpora: distributed == reference") {
    import spark.implicits._
    // a 4-letter alphabet forces heavy pair-count ties, exercising the
    // (cnt desc, a, b) tie-break across engines and repeated merges of
    // already-merged symbols
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(30)(
          (1 to (2 + rnd.nextInt(5))).map(_ => "abcd"(rnd.nextInt(4))).mkString)
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val df = words.toSeq.toDF("word", "freq")
      val (merges, syms) = Bpe.train(df, 5)
      val (refMerges, refVocab) = referenceTrain(words, 5)
      assert(merges.map(m => (m.a, m.b, m.freq)) == refMerges,
        s"seed $seed: merge sequence diverged")
      val vocab = Bpe.vocab(syms).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(vocab == refVocab, s"seed $seed: vocabulary diverged")
      syms.unpersist()
    }
  }

  test("greedy left-to-right application is non-overlapping") {
    import spark.implicits._
    // 'aaaa' under merge (a,a): [aa, aa] — never the overlapping
    // [aa, a] twice or a triple merge
    val df = Seq(("aaaa", 1L)).toDF("word", "freq")
    val (merges, syms) = Bpe.train(df, 1)
    assert(merges.map(m => (m.a, m.b)) == Seq(("a", "a")))
    val s = syms.select(col("s")).collect()(0).getSeq[String](0)
    assert(s == Seq("aa", "aa"), s"got $s")
    syms.unpersist()
  }
}
