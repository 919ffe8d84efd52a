package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated test tables
  * (TESTDATA.md). Each table is one parquet file under the
  * scale-factor directory; at cluster scale the same call resolves a
  * directory of many files — nothing here assumes single-file layout.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` ships with parquet TIMESTAMP(NANOS), which Spark reads
    * only as a long of nanos-since-epoch
    * (spark.sql.legacy.parquet.nanosAsLong=true, set by Verify/Bench).
    * Convert to a proper microsecond TimestampType here so every
    * downstream operator sees a real timestamp column.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = apply(spark, sfDir, "events")
    if (raw.schema("ts").dataType == LongType)
      // integer div, NOT `/`: Column./ is a double divide, and doubles
      // lose integer precision above 2^53 — epoch-nanos are ~1.7e18.
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
