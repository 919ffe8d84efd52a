package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * vocabulary-learning primitive of every modern LLM data pipeline
  * (t_vocab builds a WORD vocabulary; this learns SUBWORD merges).
  *
  * The classic algorithm (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units"): start from characters, then
  * repeatedly (1) count adjacent symbol pairs across the corpus
  * weighted by word frequency, (2) merge the most frequent pair
  * everywhere. Spark-shaped, that is a driver-coordinated loop like
  * PageRank/CC:
  *
  *  - state: the WORD-VOCABULARY table (word, freq, symbols[]) — not
  *    the corpus. BPE statistics are a pure function of word
  *    frequencies, so the corpus (100 TB) is scanned ONCE to build
  *    (word, freq), and every round iterates over the Heaps-law-sized
  *    vocabulary only;
  *  - per round, pair counting is one explode of zip_with'd adjacent
  *    symbols + a hash agg; the argmax is a 1-row `limit(1).collect()`
  *    (a deliberate driver-side scalar, same as CC's convergence
  *    checksum — the merge DECISION is globally sequential by
  *    definition, everything else stays distributed);
  *  - the merge applies as a codegen'd aggregate() fold over each
  *    word's symbol array: greedy LEFT-TO-RIGHT, non-overlapping —
  *    "aaa" under merge (a,a) becomes [aa, a]. Ties on count break by
  *    (a, b) lexicographic order so training is deterministic.
  *
  * BpeSpec pins the merge sequence and final vocabulary against an
  * in-memory reference on real corpus data plus the classic
  * low/lower/newest fixture.
  */
object Bpe {

  /** One learned merge: symbols `a`+`b` -> `merged`, with the weighted
    * pair count that won the round. */
  case class Merge(a: String, b: String, merged: String, freq: Long)

  /** Character-seed a word-frequency table: (word, freq) ->
    * (word, freq, s: array of single-char symbols). */
  def seed(words: DataFrame): DataFrame =
    words.withColumn("s",
      filter(split(col("word"), ""), c => c =!= ""))

  /** Adjacent-pair weighted counts over the current symbol table. */
  private def pairCounts(syms: DataFrame): DataFrame =
    syms
      .filter(size(col("s")) >= 2)
      .select(col("freq"), explode(zip_with(
        slice(col("s"), lit(1), size(col("s")) - 1),
        slice(col("s"), lit(2), size(col("s")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy left-to-right, non-overlapping single-merge application
    * as a fold over the symbol array. */
  private def applyMerge(s: Column, m: Merge): Column = {
    val emptyArr = array().cast("array<string>")
    aggregate(s, emptyArr, (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(m.a) && x === lit(m.b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(m.merged))))
        .otherwise(concat(acc, array(x))))
  }

  /** Learn `rounds` merges from a (word, freq) table.
    *
    * @return the merge sequence and the final (word, freq, s) symbol
    *         table (persisted; caller unpersists)
    */
  def train(words: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    var syms = seed(words).persist()
    syms.count() // materialize before the loop touches it
    val merges = Seq.newBuilder[Merge]
    var done = false
    var r = 0
    while (r < rounds && !done) {
      val top = pairCounts(syms)
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true // every word fully merged
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1),
          top(0).getString(0) + top(0).getString(1), top(0).getLong(2))
        merges += m
        val next = syms.withColumn("s", applyMerge(col("s"), m)).persist()
        next.count()
        syms.unpersist()
        syms = next
      }
      r += 1
    }
    (merges.result(), syms)
  }

  /** Final subword vocabulary of a trained symbol table: every symbol
    * that survives, with its weighted corpus frequency. */
  def vocab(syms: DataFrame): DataFrame =
    syms.select(col("freq"), explode(col("s")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("freq")).as("freq"))

  /** ENCODE (the inference side): tokenize a (word, freq) table with a
    * learned merge sequence by replaying the merges in training order.
    * The merge list is fixed, so this is NOT iterative — it compiles
    * into one chained codegen'd fold pipeline, a single narrow pass
    * per word (how a 100 TB corpus gets subword-tokenized with the
    * tiny trained merge table shipped in the plan as literals). */
  def encode(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(seed(words)) { (df, m) =>
      df.withColumn("s", applyMerge(col("s"), m))
    }
}
