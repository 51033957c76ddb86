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

  /** Two-tier skew join — the production form of [[saltedJoin]]:
    * only rows whose key is in `hotKeys` pay the salt/replicate cost;
    * everything else takes the plain equi-join path. The naive form
    * replicates the entire build side `buckets` times; here the
    * replication factor applies to the handful of hot keys only, so
    * the extra shuffle volume is O(hot rows x buckets) regardless of
    * corpus size. Semantically identical to `skewed.join(other, key)`
    * for any inner equi-join (the two tiers partition the key space).
    *
    * Hot keys are an explicit argument: at 100 TB you know them
    * (power-law user ids, null-ish defaults) or detect them with a
    * cheap sampled count; AQE's skew handling is the runtime fallback
    * when you don't.
    */
  def hotKeySaltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                       hotKeys: Seq[Any], buckets: Int = 8): DataFrame = {
    val isHot = col(key).isin(hotKeys: _*)
    val hot = saltedJoin(skewed.filter(isHot), other.filter(isHot), key, buckets)
    val cold = skewed.filter(!isHot).join(other.filter(!isHot), Seq(key))
    hot.unionByName(cold)
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
