package graft.imdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks K1-K2 (SURVEY.md §2.2). */
object Writers {

  /** K1: predictions TXT — one `True`/`False` per line, globally
    * ordered by tconst (the leaderboard contract,
    * data_utils.py:420-459). The reference collects to the driver and
    * formats in Python; here the format is a codegen'd projection and
    * the single file comes from coalesce(1) — swap for a partitioned
    * write when the output is no longer leaderboard-sized. */
  def savePredictionsTxt(preds: DataFrame, path: String): Unit =
    preds
      .orderBy(col("tconst"))
      .select(when(col("prediction") === 1.0, "True").otherwise("False")
        .as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(path)

  /** K2: genre-cache CSV — old ∪ new, deduped by tconst, old entries
    * winning (matches the reference's dict update order,
    * data_utils.py:404-413). */
  def saveGenreCache(oldCache: DataFrame, newPredictions: DataFrame,
                     path: String): Unit =
    oldCache.union(newPredictions)
      .dropDuplicates("tconst")
      .coalesce(1)
      .write.mode("overwrite").option("header", true).csv(path)
}
