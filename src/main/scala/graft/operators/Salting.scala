package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks. AQE's skew-join handling covers
  * the sort-merge case at runtime; these are the explicit forms for
  * when a hot key is known ahead of time (the classic power-law user
  * or null-heavy foreign key at corpus scale).
  */
object Salting {

  /** Skew-safe equi-join: the skewed (large, hot-keyed) side gets a
    * random salt in [0, buckets); the other side is replicated across
    * all salt values; the join key becomes (key, salt), splitting a
    * hot key's rows over `buckets` reducers. Semantically identical
    * to `skewed.join(other, key)` for any inner equi-join.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    val salted = skewed.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate
    * on (key, salt), then final aggregate on key. For algebraic
    * aggregates this is what map-side partial aggregation already
    * does; the explicit form helps when the partial state is large
    * (collect_list-style) and one key dominates.
    */
  def saltedCount(df: DataFrame, key: Column, buckets: Int = 8): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("cnt"))
}
