package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics — median, MAD (median absolute
  * deviation) and winsorized mean — the outlier-immune summary a
  * curation pipeline wants for quality-score and price-like columns
  * where a handful of corrupt rows wreck mean/stddev. All three are
  * EXACT integer order statistics over an integer-valued column
  * (quantize first — cents, milliunits, e4 scores): no interpolated
  * percentile anywhere, so the numbers are engine-portable by
  * construction (the same discipline as the CCNet NLL terciles;
  * interpolation formulas differ at the last ulp across engines and
  * a floor boundary can flip).
  *
  * Definitions (1-based positions in the ascending sort of n rows):
  *  - median     = value at position (n+1) div 2 (lower median)
  *  - MAD        = lower median of |x − median|
  *  - winsorized = mean after clamping into [p05, p95], where
  *    p05/p95 are the DATA VALUES at positions ceil(n/20) and
  *    ceil(95n/100); the mean ships as exact e2-of-unit fixed point
  *    (sum·100 div n — integer sums of integers, no float order).
  *
  * Scale shape: two per-group sort exchanges (the ranked pass and
  * the MAD re-rank) plus one map-combined final aggregate; the
  * quantile frame is groups-sized and broadcast back. Exact order
  * statistics fundamentally need the sort — the approximate scale
  * path at extreme group sizes is the GK sketch
  * (`q_approx_quantile`), exactly as FAISS-vs-brute splits ANN.
  *
  * @param valCol integer-valued (LONG) column — quantize floats
  *               upstream so every statistic is exact.
  * @return (groupCol, n, median, mad, winsor_mean_e2) */
object RobustStats {

  /** Exact per-group order statistics cap parallelism at the group
    * count: each group's rows sort inside ONE task however many
    * executors the cluster has (3 groups -> 3 tasks, the slowest
    * probe at 100x in SCALE.md). Pointing this at corpus-scale
    * groups must be an ERROR naming the sketch path, not a 44-second
    * task an hour into a 100 TB job — same fail-fast discipline as
    * `Similarity.embeddingNearDupPairs`' maxRows guard. The guard
    * itself is one map-combined count aggregate (narrow, corpus-scan
    * cost, nothing collected beyond one row per group). */
  def stats(df: DataFrame, groupCol: String, valCol: String,
            maxRowsPerGroup: Long = 20000000L): DataFrame = {
    val x = col(valCol).cast("long")
    // slot-persisted: the guard count, the ranked pass, the quantile
    // join-back and the MAD re-rank all read this two-column frame —
    // unpersisted it would scan the source (and re-run the quantize
    // cast) up to four times per call
    val base = PersistSlots.swap("robust.base",
      df.select(col(groupCol), x.as("__x"))
        .filter(col("__x").isNotNull))
    val biggest = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__c"))
      .agg(coalesce(max(col("__c")), lit(0L))).head().getLong(0)
    require(biggest <= maxRowsPerGroup,
      s"RobustStats.stats sorts each group inside a single task (exact " +
        s"order statistics): largest group has $biggest rows, over " +
        s"maxRowsPerGroup=$maxRowsPerGroup. Use the mergeable quantile " +
        s"sketch (q_approx_quantile: approx_percentile) for corpus-scale " +
        "groups, or raise maxRowsPerGroup deliberately.")
    // POSITION arithmetic uses the cheap double-division idiom: the
    // operands are row counts (row_number is an int), far inside the
    // 2^53 exactness window at any conceivable group size, and the
    // exact-decimal route costs measurably on this per-row path
    // (+50% end-to-end at sf0.1). The winsorized MEAN below uses
    // IntMath.idivTrunc — its sum·100 numerator genuinely can pass
    // 2^53 at corpus scale.
    def posDiv(a: Column, n: Column): Column =
      ((a - (a % n)) / n).cast("long")

    val w = Window.partitionBy(col(groupCol)).orderBy(col("__x").asc)
    val cw = Window.partitionBy(col(groupCol))
    val ranked = base
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
    // order-statistic positions: ties sort arbitrarily but carry the
    // same value, so the selected VALUE is deterministic
    val medPos = posDiv(col("__n") + 1, lit(2L))
    val p05Pos = posDiv(col("__n") + 19, lit(20L))
    val p95Pos = posDiv(col("__n") * 95 + 99, lit(100L))
    val qs = ranked.groupBy(col(groupCol)).agg(
      max(when(col("__rn") === medPos, col("__x"))).as("__med"),
      max(when(col("__rn") === p05Pos, col("__x"))).as("__p05"),
      max(when(col("__rn") === p95Pos, col("__x"))).as("__p95"),
      max(col("__n")).as("__gn"))

    val joined = base.join(broadcast(qs), Seq(groupCol))
    val dw = Window.partitionBy(col(groupCol))
      .orderBy(abs(col("__x") - col("__med")).asc)
    val mad = joined
      .withColumn("__rn", row_number().over(dw))
      .filter(col("__rn") === posDiv(col("__gn") + 1, lit(2L)))
      .select(col(groupCol),
        abs(col("__x") - col("__med")).as("mad"))

    joined
      .groupBy(col(groupCol))
      .agg(max(col("__gn")).as("n"),
        max(col("__med")).as("median"),
        sum(least(greatest(col("__x"), col("__p05")), col("__p95")))
          .as("__ws"))
      .join(mad, Seq(groupCol))
      .select(col(groupCol), col("n"), col("median"), col("mad"),
        // decimal-widened numerator: __ws is a corpus-scale group sum,
        // and __ws * 100 in LONG wraps past ~9.2e16
        IntMath.scaledDivTrunc(col("__ws"), 100L, col("n"))
          .as("winsor_mean_e2"))
  }
}
