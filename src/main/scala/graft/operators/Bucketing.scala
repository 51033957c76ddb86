package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-storage helpers: persist a frame hash-bucketed (and
  * sorted) by its join key so repeated joins/aggregations on that key
  * read co-located data and skip the Exchange entirely — the
  * pre-shuffle trade that pays for itself the second time a 100 TB
  * fact table is joined on the same key.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables previously bucketed on the same key with the
    * same bucket count: with bucketing enabled the plan contains no
    * Exchange on either side (SortMergeJoin reads buckets
    * co-located). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
