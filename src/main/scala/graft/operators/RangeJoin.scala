package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested-loop plan.
  *
  * The reference has no joins at all (SURVEY.md §2.6); Spark's
  * built-in answer to `point BETWEEN start AND end` with no equi-key
  * is BroadcastNestedLoopJoin — O(|points| x |intervals|) work that
  * stops scaling the moment the interval side outgrows a broadcast.
  * The standard scale shape (used by every warehouse range-join
  * implementation, e.g. the OVERLAPS bucketing in Flink and the
  * binned range join literature) is:
  *
  *   1. quantize time into fixed-width buckets;
  *   2. explode each interval into the buckets it overlaps
  *      (`sequence`, a few rows for interval ≈ bucket width);
  *   3. equi-join points to intervals on the bucket — a plain
  *      shuffle/broadcast hash join Catalyst can reason about;
  *   4. re-check the exact predicate as a residual filter.
  *
  * Each point falls in exactly one bucket and an interval emits each
  * bucket once, so matches are already unique — no dedup pass.
  * Choose the bucket width near the median interval length: the
  * explode factor stays O(1) and every candidate pair shares a
  * bucket. Skewed hot buckets remain ordinary join skew (AQE / salt).
  */
object RangeJoin {

  /** Inner join `points` to `intervals` on
    * `start <= point < end` (half-open), bucketed at `bucket`
    * granularity (a `date_trunc` unit: HOUR / DAY / WEEK / MONTH —
    * pick the one nearest the median interval length so the explode
    * factor stays O(1)).
    *
    * Malformed intervals (`end < start`) match nothing — same result
    * as the theta-join this operator replaces — rather than blowing
    * up `sequence` with reversed boundaries.
    *
    * @param points    frame containing `ptCol` (timestamp)
    * @param intervals frame containing `startCol`/`endCol` (timestamp)
    */
  private val BucketUnits = Set("HOUR", "DAY", "WEEK", "MONTH")

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      bucket: String = "DAY"): DataFrame = {
    // an unknown unit would make date_trunc return NULL for every row
    // and the join silently empty — fail loudly instead
    require(BucketUnits.contains(bucket.toUpperCase),
      s"bucket must be one of $BucketUnits, got '$bucket'")
    val bucketed = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(sequence(
          date_trunc(bucket, col(startCol)),
          date_trunc(bucket, col(endCol)),
          expr(s"INTERVAL 1 $bucket"))))
    val pts = points.withColumn("__bucket", date_trunc(bucket, col(ptCol)))
    pts.join(bucketed, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join (interval × interval, half-open:
    * `[s1, e1)` overlaps `[s2, e2)` iff `s1 < e2 AND s2 < e1`) with
    * the same bucketed shape — sessions × outages, campaigns ×
    * promotions, the binary temporal-join every event pipeline
    * eventually needs, again without a BroadcastNestedLoopJoin.
    *
    * Both sides explode into their buckets and equi-join on the
    * bucket; an overlapping pair shares EVERY bucket of the overlap,
    * so matches would duplicate — the standard dedup-free trick
    * keeps a match only in the FIRST shared bucket, which for an
    * overlapping pair is exactly `greatest(trunc(s1), trunc(s2))`.
    * One hash join, no distinct pass, each qualifying pair exactly
    * once. Explode factor stays O(1) with the bucket near the median
    * interval length; hot buckets are ordinary join skew (AQE/salt).
    * Output = left row ++ right row (caller renames clashes). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucket: String = "DAY"): DataFrame = {
    require(BucketUnits.contains(bucket.toUpperCase),
      s"bucket must be one of $BucketUnits, got '$bucket'")
    // strict: a zero-length interval [s, s) is EMPTY under half-open
    // semantics and must overlap nothing — with >= it would survive
    // banding and the s1 < e2 AND s2 < e1 predicate admits it against
    // any interval strictly containing its point
    def banded(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bucket",
        explode(sequence(
          date_trunc(bucket, col(s)),
          date_trunc(bucket, col(e)),
          expr(s"INTERVAL 1 $bucket"))))
    banded(left, lStart, lEnd).join(banded(right, rStart, rEnd), Seq("__bucket"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bucket") ===
        greatest(date_trunc(bucket, col(lStart)), date_trunc(bucket, col(rStart))))
      .drop("__bucket")
  }
}
