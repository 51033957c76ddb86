package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality assertions — the validation gate a
  * pipeline runs BEFORE promoting a snapshot (the Great-Expectations
  * / dbt-test pattern): row-level predicates, key uniqueness, and
  * referential integrity, each reduced to one summary row
  * (check, n_rows, n_fail, pass).
  *
  * Scale shape: all row predicates for one table fold into a SINGLE
  * map-combined aggregation over one scan (a suite of 20 checks
  * costs one pass, not 20); uniqueness is one map-combined distinct
  * count; referential integrity is one anti-join whose build side
  * Spark broadcasts when small. Nothing returns more than one row
  * per check — the output is a report, never data.
  */
object Expectations {

  /** Row-level predicate checks: ONE aggregation pass over `df`,
    * counting failures of each predicate (null predicate results
    * count as failures — an assertion that cannot evaluate is not a
    * pass). */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    // check names are spliced into a selectExpr stack() and into
    // column aliases — restrict them to plain identifiers so a quote
    // / space / dot / backtick can't break parsing or inject SQL
    checks.foreach { case (name, _) =>
      require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"check name must match [A-Za-z_][A-Za-z0-9_]*, got '$name'")
    }
    val aggs = count(lit(1)).as("__n") +:
      checks.map { case (name, pred) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
          .as(s"__f_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single summary row to one row per check: the frame
    // is one row, so the stack is driver-free and exchange-free
    val stacked = checks.map { case (name, _) =>
      s"'$name', __n, __f_$name"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${checks.length}, $stacked) AS (cname, n_rows, n_fail)")
      .select(col("cname").as("check"), col("n_rows"), col("n_fail"),
        (col("n_fail") === 0).cast("int").as("pass"))
  }

  /** Key-uniqueness check: n_fail = rows beyond the first per
    * distinct key tuple (0 iff the key is unique). One map-combined
    * count-distinct aggregation. */
  def unique(df: DataFrame, keyCols: Seq[String],
             name: String): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        countDistinct(keyCols.head, keyCols.tail: _*).as("__d"))
      .select(lit(name).as("check"), col("n_rows"),
        (col("n_rows") - col("__d")).as("n_fail"),
        (col("n_rows") === col("__d")).cast("int").as("pass"))

  /** Referential-integrity check: n_fail = child rows whose key has
    * no parent (left anti join; null child keys are orphans — a row
    * that cannot name its parent fails the expectation). */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String,
                   name: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_rows"))
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_fail"))
    total.crossJoin(orphans)
      .select(lit(name).as("check"), col("n_rows"), col("n_fail"),
        (col("n_fail") === 0).cast("int").as("pass"))
  }

  /** Union a suite of check frames into the one-row-per-check
    * report. */
  def suite(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_))

  /** k-anonymity profile over a quasi-identifier combination — the
    * re-identification-risk report a privacy review reads next to
    * the PII scrub: group every row by its quasi-identifier tuple
    * (the attributes an adversary can link externally: source
    * domain, language, coarse length, ...), call the group size k,
    * and report the k-distribution — how many equivalence classes
    * and how many ROWS sit at each k, with classes below `kMin`
    * flagged (a document alone in its (host, lang, length) cell is
    * linkable even after its PII strings are scrubbed; Sweeney's
    * k-anonymity, restated over corpus metadata).
    *
    * Scale shape: one map-combined aggregation over the
    * quasi-identifier projection (the corpus pays one narrow scan —
    * no text bytes unless a QI derives from them), then a second
    * aggregation over the |classes| rows. Output is one row per
    * DISTINCT k — bounded by the largest class size's divisor
    * structure, in practice tens of rows. No row data leaves the
    * aggregation, so the report itself is safe to share.
    */
  def kAnonymityProfile(df: DataFrame, quasiIds: Seq[Column],
                        kMin: Long): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier")
    require(kMin >= 1, s"kMin must be >= 1, got $kMin")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("k")).as("n_docs"))
      .withColumn("at_risk", (col("k") < kMin).cast("int"))
  }

  /** l-diversity profile (Machanavajjhala et al. 2007, the
    * re-identification gauge k-anonymity cannot give): a
    * quasi-identifier class where every member shares ONE sensitive
    * value leaks that value even at k = 1000 — so per class the
    * metric is the number of DISTINCT sensitive values (`l`), and
    * the report is the class histogram over l, with classes under
    * `lMin` flagged. Same release-shaped contract as
    * [[kAnonymityProfile]]: one row per distinct l, no row data
    * leaves the aggregation.
    *
    * Scale shape: one exact count-distinct aggregation on the
    * quasi-id key (two map-combined exchanges — Spark plans exact
    * `countDistinct` as an expand + re-aggregate, both bounded by
    * |classes x distinct sensitive values|), then a second
    * aggregation over the |classes| rows. */
  def lDiversityProfile(df: DataFrame, quasiIds: Seq[Column],
                        sensitive: Column, lMin: Long): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier")
    require(lMin >= 1, s"lMin must be >= 1, got $lMin")
    df.groupBy(quasiIds: _*)
      .agg(countDistinct(sensitive).as("l"),
        count(lit(1)).as("__n"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__n")).as("n_docs"))
      .withColumn("at_risk", (col("l") < lMin).cast("int"))
  }

  /** t-closeness profile (Li, Li & Venkatasubramanian 2007) — the
    * third rung of the privacy ladder: l-diversity still leaks when a
    * class's sensitive values are diverse but SKEWED relative to the
    * corpus (a class that is 90% one source reveals likely membership
    * even with l = 3 distinct sources). Per quasi-identifier class
    * the metric is the total-variation (L1/2) distance between the
    * class's sensitive-value distribution and the corpus-wide one, in
    * EXACT integer e6 fixed point over the common denominator:
    *
    *   d_e6 = (Σ_v |n_cv·n − n_v·n_c| · 500000) div (n_c · n)
    *
    * where the Σ over values ABSENT from the class collapses in
    * closed form to `(n − Σ_present n_v) · n_c` — no expansion to the
    * full class × value cross product is ever materialized. The
    * report is the class histogram over `bucketE6`-wide distance
    * buckets with buckets at or above `tMaxE6` flagged (classes at
    * exactly t land in the flagged bucket — conservative by one ULP
    * of the bucket width). Same release-shaped contract as the other
    * profiles: no row data leaves the aggregation.
    *
    * Scale shape: ONE corpus scan (the map-combined (class, value)
    * count); everything after rides that bounded \|classes × values\|
    * frame down a SINGLE chain of window sums — `n_v` over the value,
    * `n_c` over the class, `n` over the whole (bounded) frame — then
    * two aggregations. Optimization round 17: this replaces the
    * previous three broadcast self-joins (vt/cls/n legs) over a
    * slot-persisted cv. The join form was algebra on the same tiny
    * frame, but it cost 4 separately-planned consumers of a cached
    * relation (134 tasks / 10 driver-planned jobs per run measured at
    * 32 cores — the cache's partitioning is pinned at
    * spark.sql.shuffle.partitions because AQE does not re-plan cached
    * subtrees, so every consumer stage paid 32 micro-task overheads)
    * — 4.5-6 CPU-s of engine overhead on ~0.3 CPU-s of real work.
    * The window chain is one linear plan: AQE coalescing stays live,
    * nothing is cached, and the identical integer sums come out
    * (window partition-by groups NULLs exactly like the group-bys it
    * replaces — a NULL sensitive value is a value, a NULL quasi-id is
    * a class, preserved by construction rather than by null-safe join
    * keys). The whole-frame window moves the |classes × values| frame
    * through one task — bounded by the profile's own output contract,
    * never by the corpus. Fixed-point overflow bound: `n_c · n · 1e6`
    * must fit a long, i.e. corpus rows × largest-class rows < ~9.2e12
    * — fine to ~3M-row classes at 3M docs; shard the profile by a QI
    * column beyond that. */
  def tClosenessProfile(df: DataFrame, quasiIds: Seq[Column],
                        sensitive: Column, tMaxE6: Long,
                        bucketE6: Long = 100000L): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier")
    require(tMaxE6 >= 0 && bucketE6 >= 1 && tMaxE6 % bucketE6 == 0,
      s"tMaxE6 ($tMaxE6) must be a nonnegative multiple of bucketE6 ($bucketE6)")
    import org.apache.spark.sql.expressions.Window
    val qiNames = quasiIds.indices.map(i => s"__qi$i")
    val qiCols = qiNames.map(col)
    val base = df.select(
      quasiIds.zip(qiNames).map { case (c, n) => c.as(n) } :+
        sensitive.as("__sv"): _*)
    val cv = base.groupBy(qiCols :+ col("__sv"): _*)
      .agg(count(lit(1)).as("n_cv"))
    cv.withColumn("n_v",
        sum(col("n_cv")).over(Window.partitionBy(col("__sv"))))
      .withColumn("n_c",
        sum(col("n_cv")).over(Window.partitionBy(qiCols: _*)))
      // whole-frame total: the frame is |classes × values|-bounded,
      // so the single-partition window is a report-sized task
      .withColumn("n", sum(col("n_cv")).over(Window.partitionBy()))
      .groupBy(qiCols: _*)
      .agg(sum(abs(col("n_cv") * col("n") - col("n_v") * col("n_c")))
          .as("s1"),
        sum(col("n_v")).as("sv"),
        max(col("n_c")).as("n_c"), max(col("n")).as("n"))
      // integer div: both operands nonnegative, so Spark's truncating
      // div == DuckDB's flooring // (the oracle-portability rule)
      .withColumn("d_e6", expr("(s1 + (n - sv) * n_c) * 500000 div (n_c * n)"))
      .groupBy((col("d_e6") - pmod(col("d_e6"), lit(bucketE6)))
        .as("d_bucket_e6"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n_c")).as("n_docs"))
      .withColumn("at_risk", (col("d_bucket_e6") >= tMaxE6).cast("int"))
  }
}
