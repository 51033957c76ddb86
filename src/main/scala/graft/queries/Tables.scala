package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-provided parquet tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table carries a TIMESTAMP(NANOS) column, which Spark
    * only reads as a nanosecond LongType behind the legacy flag (set
    * here at query time so it holds under any session). Callers get
    * `ts` as epoch nanoseconds; use integer `div` arithmetic — a
    * double division would lose precision at 1e18 magnitudes.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }
}
