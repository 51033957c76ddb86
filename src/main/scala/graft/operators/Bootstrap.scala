package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Resampling-based uncertainty at corpus scale: per-group
  * half-sample (McCarthy-style) confidence intervals for the mean,
  * with DETERMINISTIC replicate membership — row r belongs to
  * replicate b iff bit b of md5(key) is set, so every replicate is an
  * independent ~half-sample, the whole estimate replays exactly in
  * SQL, and adding executors cannot change the answer.
  *
  * Scale shape: ALL B replicates fold into ONE map-combined
  * aggregation pass (2B conditional sums per group — no resampled
  * copies of the data ever materialize, the classic bootstrap
  * blow-up); the replicate spread computes in a scalar projection
  * over the B-element arrays. One exchange, B bounded (<= 32).
  */
object Bootstrap {

  /** @param keyCol a stable unique row key (drives replicate
    *               membership; md5 of its string form)
    * @param b      replicate count in [2, 32] (bits of the first 8
    *               md5 hex digits)
    * @return (groupCol, n, mean, se, lo95, hi95) — mean of the value,
    *         half-sample standard error (stddev of replicate means),
    *         and the +-1.96 se interval, all rounded 2dp (the repo's
    *         float-aggregate determinism discipline). */
  def halfSampleCI(df: DataFrame, groupCol: String, valueCol: String,
                   keyCol: String, b: Int = 32): DataFrame = {
    require(b >= 2 && b <= 32, s"replicates must be in [2, 32], got $b")
    // bit b of the first 32 md5 bits of the key
    val bits = conv(substring(md5(col(keyCol).cast("string")), 1, 8),
      16, 10).cast("long")
    val repSum = (0 until b).map(i =>
      sum(when(bits.bitwiseAND(lit(1L << i)) =!= 0, col(valueCol))
        .otherwise(lit(0.0))).as(s"__s$i"))
    val repCnt = (0 until b).map(i =>
      sum(when(bits.bitwiseAND(lit(1L << i)) =!= 0, 1L)
        .otherwise(0L)).as(s"__c$i"))
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        (Seq(sum(col(valueCol)).as("__tot")) ++ repSum ++ repCnt): _*)
    // replicate means (empty replicates drop out), then their spread
    val means = array((0 until b).map(i =>
      when(col(s"__c$i") > 0, col(s"__s$i") / col(s"__c$i"))): _*)
    agg
      .withColumn("__m", filter(means, m => m.isNotNull))
      .withColumn("__k", size(col("__m")).cast("double"))
      .withColumn("__mbar",
        aggregate(col("__m"), lit(0.0), (a, x) => a + x) / col("__k"))
      .withColumn("__se",
        when(col("__k") > 1, sqrt(
          aggregate(col("__m"), lit(0.0),
            (a, x) => a + (x - col("__mbar")) * (x - col("__mbar"))) /
            (col("__k") - 1))).otherwise(lit(0.0)))
      .select(col(groupCol), col("n"),
        round(col("__tot") / col("n"), 2).as("mean"),
        round(col("__se"), 2).as("se"),
        round(col("__tot") / col("n") - lit(1.96) * col("__se"), 2).as("lo95"),
        round(col("__tot") / col("n") + lit(1.96) * col("__se"), 2).as("hi95"))
  }
}
