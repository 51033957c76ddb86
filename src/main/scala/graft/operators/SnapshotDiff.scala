package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff between two snapshots of a table — the versioning
  * primitive of a continuously-rebuilt training corpus: which
  * documents did this crawl add, which disappeared, which changed
  * content under the same id? The output is the audit artifact a
  * dataset card cites ("v7 = v6 + 1.2M docs - 0.3M, 40k rewritten")
  * and the input to incremental downstream work (only `added` and
  * `changed` rows need re-embedding / re-scoring).
  *
  * Rows identical in both snapshots are dropped — output size is
  * bounded by the CHURN, not the corpus, which is what makes the
  * operator usable at 100 TB (a weekly crawl churns a few percent).
  *
  * Scale shape: each side reduces to (key, fingerprint) at scan
  * time — the comparison columns never shuffle, only their md5
  * rides the exchange — then one full-outer sort-merge join on the
  * key. With both snapshots bucketed by key (Bucketing.scala) the
  * exchange disappears entirely; otherwise AQE sizes it. No driver
  * pass, no collect.
  */
object SnapshotDiff {

  /** Diff `cur` against `old` on `keyCols`, comparing the md5
    * fingerprint of `compareCols` (order-sensitive, null-safe via a
    * reserved separator).
    *
    * @return one row per differing key:
    *         (keyCols..., status in {added, removed, changed},
    *          old_fp, new_fp) — fingerprints null on the absent
    *         side. */
  def diff(old: DataFrame, cur: DataFrame,
           keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "diff needs at least one key column and one compare column")
    // nulls collapse to a sentinel INSIDE the concat so (null, "x")
    // and ("", "x") fingerprint differently from ("x", null)
    def fp(df: DataFrame, as: String): DataFrame = df.select(
      keyCols.map(col) :+
        md5(concat_ws("",
          compareCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
          .as(as): _*)
    val o = fp(old, "old_fp")
    val n = fp(cur, "new_fp")
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keyCols.map(col) ++
        Seq(col("status"), col("old_fp"), col("new_fp")): _*)
  }
}
