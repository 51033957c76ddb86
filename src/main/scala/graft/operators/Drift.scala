package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot drift detection — the monitoring step of a continuously
  * re-crawled training corpus: did this week's crawl shift the length
  * / quality / label distribution vs the reference snapshot the
  * filters were tuned on? (CCNet re-fits its perplexity threshold per
  * snapshot for exactly this reason.)
  *
  * Both statistics are computed in the fixed-point discipline the
  * rest of the engine uses (LanguageModel.scala): every transcendental
  * term is floored to integer micro-units BEFORE the sum, so the
  * result is an exact integer artifact that replays bit-identically
  * in any engine — a drift alert should never depend on float
  * summation order.
  *
  * Scale shape: each side is one map-combined count aggregation; the
  * join that aligns the two histograms runs on the BUCKET table
  * (cardinality = distinct buckets / categories, independent of
  * corpus row count), and the totals ride in as one-row broadcast
  * frames. Nothing here grows with the corpus except the two
  * initial scans — 100 TB safe by construction.
  */
object Drift {

  /** Add-one-smoothed share of a count column: (c + 1) / (n + b),
    * with the same literal shape on both engines. */
  private def share(c: Column, n: Column, b: Column): Column =
    (c + lit(1)).cast("double") / (n + b).cast("double")

  /** Population Stability Index of a numeric column between a
    * reference and a current snapshot, over fixed-width buckets
    * (`bucket = floor(value / width)` — fixed-width rather than
    * ref-quantile bounds so the bucketing is a pure per-row map and
    * the same bucket ids mean the same value range across runs).
    *
    * Laplace add-one smoothing over the union bucket set keeps
    * ln defined for one-sided buckets; each bucket's contribution
    * `(p - q) * ln(p / q)` (always >= 0) is floored to micro-units.
    *
    * @return one row per occupied bucket:
    *         (bucket, ref_n, cur_n, contrib_e6); `sum(contrib_e6)`
    *         is the PSI in micro-units. Rule of thumb: PSI < 0.1
    *         stable, 0.1-0.25 moderate shift, > 0.25 re-tune the
    *         filters. */
  def psiNumeric(ref: DataFrame, cur: DataFrame, valueCol: String,
                 bucketWidth: Double): DataFrame = {
    val bucket = floor(col(valueCol) / lit(bucketWidth)).cast("long").as("bucket")
    val r = ref.select(bucket).groupBy("bucket").agg(count(lit(1)).as("ref_n"))
    val c = cur.select(bucket).groupBy("bucket").agg(count(lit(1)).as("cur_n"))
    // null-SAFE key: a null value floors to a null bucket, which is a
    // real cohort ("value missing") — an equality-keyed full outer
    // join would enter its ref and cur counts as two disjoint
    // half-rows, inflating the bucket count and distorting the PSI
    val joined = r.as("r").join(c.as("c"),
        col("r.bucket") <=> col("c.bucket"), "full_outer")
      .select(coalesce(col("r.bucket"), col("c.bucket")).as("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val totals = joined.agg(
      sum(col("ref_n")).as("__nr"), sum(col("cur_n")).as("__nc"),
      count(lit(1)).as("__b"))
    val p = share(col("ref_n"), col("__nr"), col("__b"))
    val q = share(col("cur_n"), col("__nc"), col("__b"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        floor(lit(1000000.0) * (p - q) * log(p / q))
          .cast("long").as("contrib_e6"))
  }

  /** Per-GROUP PSI — the "WHICH source drifted" alert table, where
    * [[psiNumeric]] only says that the corpus did: the same
    * smoothed, micro-unit-floored PSI computed independently inside
    * every group (source, language, shard), one summary row per
    * group ready for a threshold filter.
    *
    * Scale shape: two map-combined (group, bucket) count
    * aggregations, a per-group totals join (group-cardinality-sized,
    * not corpus-sized) and one final integer-sum aggregate — the
    * exchange carries one row per occupied (group, bucket), and the
    * per-bucket contributions are integers, so the per-group sum is
    * order-free and replays exactly.
    * @return one row per group: (groupCol, n_buckets, psi_e6) */
  def psiByGroup(ref: DataFrame, cur: DataFrame, groupCol: String,
                 valueCol: String, bucketWidth: Double): DataFrame = {
    val bucket = floor(col(valueCol) / lit(bucketWidth)).cast("long").as("bucket")
    val r = ref.select(col(groupCol).as("__g"), bucket)
      .groupBy("__g", "bucket").agg(count(lit(1)).as("ref_n"))
    val c = cur.select(col(groupCol).as("__g"), bucket)
      .groupBy("__g", "bucket").agg(count(lit(1)).as("cur_n"))
    // null-SAFE keys throughout: a NULL group (or null-value bucket)
    // is a real cohort — "source unknown" drifting is exactly what
    // this alert table must surface. Equality-keyed joins would split
    // its ref/cur counts into disjoint half-rows (inflated n_buckets,
    // distorted PSI for that group).
    val joined = r.as("r").join(c.as("c"),
        col("r.__g") <=> col("c.__g") &&
          col("r.bucket") <=> col("c.bucket"), "full_outer")
      .select(coalesce(col("r.__g"), col("c.__g")).as("__g"),
        coalesce(col("r.bucket"), col("c.bucket")).as("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val totals = joined.groupBy(col("__g")).agg(
      sum(col("ref_n")).as("__nr"), sum(col("cur_n")).as("__nc"),
      count(lit(1)).as("__b"))
    val p = share(col("ref_n"), col("__nr"), col("__b"))
    val q = share(col("cur_n"), col("__nc"), col("__b"))
    joined.join(totals.withColumnRenamed("__g", "__tg"),
        col("__g") <=> col("__tg"))
      .select(col("__g"), col("bucket"),
        floor(lit(1000000.0) * (p - q) * log(p / q))
          .cast("long").as("contrib_e6"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("contrib_e6")).as("psi_e6"))
      .select(col("__g").as(groupCol), col("n_buckets"), col("psi_e6"))
  }

  /** Jensen-Shannon divergence of a categorical column (label, lang,
    * source, event type) between two snapshots — symmetric and
    * bounded by ln 2, so thresholds transfer across columns. Same
    * smoothing and per-term micro-unit floor as [[psiNumeric]]:
    * `0.5 * p * ln(p/m) + 0.5 * q * ln(q/m)` with `m = (p+q)/2`,
    * each half floored separately.
    *
    * @return one row per category:
    *         (key, ref_n, cur_n, contrib_e6); `sum(contrib_e6)` is
    *         the JS divergence in micro-units. */
  def jsCategorical(ref: DataFrame, cur: DataFrame, keyCol: String): DataFrame = {
    val r = ref.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("ref_n"))
    val c = cur.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cur_n"))
    // null-safe key: the NULL category aligns as one row (see
    // [[psiNumeric]])
    val joined = r.as("r").join(c.as("c"),
        col("r.key") <=> col("c.key"), "full_outer")
      .select(coalesce(col("r.key"), col("c.key")).as("key"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val totals = joined.agg(
      sum(col("ref_n")).as("__nr"), sum(col("cur_n")).as("__nc"),
      count(lit(1)).as("__b"))
    val p = share(col("ref_n"), col("__nr"), col("__b"))
    val q = share(col("cur_n"), col("__nc"), col("__b"))
    val m = (p + q) / lit(2.0)
    joined.crossJoin(broadcast(totals))
      .select(col("key"), col("ref_n"), col("cur_n"),
        (floor(lit(500000.0) * p * log(p / m)) +
         floor(lit(500000.0) * q * log(q / m)))
          .cast("long").as("contrib_e6"))
  }
}
