package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Driver-provided parquet tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` column has shipped in two physical
    * layouts across fixture generations: TIMESTAMP(NANOS), which Spark
    * only reads as a nanosecond LongType behind the legacy flag, and
    * TIMESTAMP(MICROS) isAdjustedToUTC=false, which reads as
    * TIMESTAMP_NTZ. Callers get one stable contract either way:
    * `ts` as epoch-nanosecond BIGINT. Use integer `div` arithmetic —
    * a double division would lose precision at 1e18 magnitudes.
    * (Sessions here pin spark.sql.session.timeZone=UTC, so the
    * NTZ→timestamp cast below is the identity on the stored value.)
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => df // nanos-as-long under the legacy flag
      case TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
}
