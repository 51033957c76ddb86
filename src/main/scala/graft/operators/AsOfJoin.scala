package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator the reference lacks and Spark
  * has no built-in for. For each left row, attach the latest right
  * row whose time is <= the left row's time, matching on equi-keys.
  *
  * Implementation is union + ordered window rather than an
  * inequality join: both sides shuffle ONCE on the key, rows sort by
  * (time, side) within each key partition, and a running
  * last-non-null carries the right payload forward. This stays
  * O(n log n) per partition with no range-explosion, uses a single
  * Exchange per side, and inherits AQE skew handling — the shape that
  * survives 100 TB, unlike a `left.time >= right.time` theta join
  * which Spark would plan as a broadcast-nested-loop.
  */
object AsOfJoin {

  /** @param rightCols right columns to carry (renamed as given);
    *                   must not collide with left column names.
    * @param tolerance  optional max lookback in the time columns'
    *                   own (numeric) units — a match older than
    *                   `leftTime - tolerance` comes back as null,
    *                   pandas merge_asof-style. Requires numeric
    *                   (epoch) time columns.
    *
    * When several right rows tie on (key, time), the one with the
    * largest xxhash64 of its payload wins — an arbitrary but
    * DETERMINISTIC choice (partitioning cannot change the answer),
    * required because `rightCols` may carry payload columns beyond
    * the match time.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[(String, String)],
               tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    val leftCols = left.columns.toSeq
    val pType = payloadType(right, rightCols, rightTime)
    val (lTagged, rAligned) = tagAndAlign(left, right, keys, leftTime,
      rightTime, rightCols, pType)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, tiebreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val rawMatch = last(col("__payload"), ignoreNulls = true).over(w)
    val joined = lTagged.unionByName(rAligned)
      .withColumn("__match", tolerance match {
        case None => rawMatch
        case Some(t) =>
          when(col("__t").cast("long") - rawMatch.getField("__mt").cast("long") <= t,
            rawMatch).otherwise(lit(null).cast(pType))
      })
      .filter(col("__side") === 1)

    val out: Seq[Column] = leftCols.map(col) ++
      rightCols.map(_._2).map(d => col(s"__match.$d").as(d))
    joined.select(out: _*)
  }

  /** As-of FORWARD join: for each left row, the EARLIEST right row
    * whose time is >= the left row's time (pandas merge_asof
    * `direction='forward'`). Same single-exchange union + ordered
    * window shape as [[backward]], mirrored by sorting time
    * DESCENDING and taking the running `last(ignoreNulls)` — Spark
    * evaluates the [unboundedPreceding, currentRow] frame
    * incrementally in O(n) per key partition, whereas the naive
    * [currentRow, unboundedFollowing] + `first` frame re-aggregates
    * the whole remainder for every row (O(n²) on a hot key). At equal
    * times the right side sorts BEFORE the left (a right row at
    * exactly the left row's time is eligible under >= semantics).
    * @param tolerance max lookahead in the time columns' own units —
    *                  a match further than `leftTime + tolerance`
    *                  comes back null. Requires numeric time columns.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String,
              rightCols: Seq[(String, String)],
              tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    val leftCols = left.columns.toSeq
    val pType = payloadType(right, rightCols, rightTime)
    val (lTagged, rAligned) = tagAndAlign(left, right, keys, leftTime,
      rightTime, rightCols, pType)

    // Descending time: the running last() is the right row with the
    // SMALLEST __t >= the current left row's __t. __side asc at equal
    // __t scans rights before the left row; last() takes the FINAL
    // row of a fully-tied (key, time) group, so tiebreak asc makes
    // the max-hash payload win, matching [[backward]]'s choice.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc, tiebreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val rawMatch = last(col("__payload"), ignoreNulls = true).over(w)
    val joined = lTagged.unionByName(rAligned)
      .withColumn("__match", tolerance match {
        case None => rawMatch
        case Some(t) =>
          when(rawMatch.getField("__mt").cast("long") - col("__t").cast("long") <= t,
            rawMatch).otherwise(lit(null).cast(pType))
      })
      .filter(col("__side") === 1)

    val out: Seq[Column] = leftCols.map(col) ++
      rightCols.map(_._2).map(d => col(s"__match.$d").as(d))
    joined.select(out: _*)
  }

  /** As-of NEAREST join: for each left row, the right row whose time
    * is closest in absolute distance (pandas merge_asof
    * `direction='nearest'`; ties resolve BACKWARD, matching pandas).
    * Computes the backward and forward candidates with two window
    * passes over the SAME key partitioning — one exchange, two
    * intra-partition sorts — then picks per row. Requires numeric
    * (epoch) time columns for the distance arithmetic.
    * @param tolerance max absolute distance in the time columns' own
    *                  units; candidates beyond it are dropped BEFORE
    *                  the nearest choice (pandas semantics).
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String,
              rightCols: Seq[(String, String)],
              tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    val leftCols = left.columns.toSeq
    val pType = payloadType(right, rightCols, rightTime)
    val (lTagged, rAligned) = tagAndAlign(left, right, keys, leftTime,
      rightTime, rightCols, pType)

    // Both legs run as RUNNING frames (incremental O(n) per key
    // partition): the forward candidate comes from a second,
    // descending intra-partition sort rather than an
    // unboundedFollowing frame, which Spark re-aggregates from
    // scratch per row (O(n²) on a hot key).
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, tiebreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc, tiebreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def within(m: Column): Column = tolerance match {
      case None => m
      case Some(t) =>
        when(abs(m.getField("__mt").cast("long") - col("__t").cast("long")) <= t,
          m).otherwise(lit(null).cast(pType))
    }
    val back = within(last(col("__payload"), ignoreNulls = true).over(wBack))
    val fwd = within(last(col("__payload"), ignoreNulls = true).over(wFwd))

    val joined = lTagged.unionByName(rAligned)
      .withColumn("__back", back)
      .withColumn("__fwd", fwd)
      .filter(col("__side") === 1)
      // ties (equidistant back and fwd) resolve backward, like pandas
      .withColumn("__match",
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(col("__t").cast("long") - col("__back.__mt").cast("long") <=
                col("__fwd.__mt").cast("long") - col("__t").cast("long"),
            col("__back"))
          .otherwise(col("__fwd")))

    val out: Seq[Column] = leftCols.map(col) ++
      rightCols.map(_._2).map(d => col(s"__match.$d").as(d))
    joined.select(out: _*)
  }

  /** Deterministic right-row tiebreak at equal (key, time): xxhash64
    * of the payload struct. Left rows carry a null payload, which
    * hash expressions pass through (the seed), so the tiebreak never
    * reorders a left row relative to its __side slot. */
  private def tiebreak: Column = xxhash64(col("__payload"))

  /** Shared union-input construction: left tagged (side=1, null
    * payload), right projected to (keys, __t, side=0, payload struct)
    * and aligned to the left's columns. */
  private def tagAndAlign(left: DataFrame, right: DataFrame,
                          keys: Seq[String], leftTime: String,
                          rightTime: String,
                          rightCols: Seq[(String, String)],
                          pType: org.apache.spark.sql.types.StructType)
  : (DataFrame, DataFrame) = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(pType))
    val rTagged = right
      .select((keys.map(col) :+ col(rightTime).as("__t")) ++
        Seq(lit(0).as("__side"),
          struct((rightCols.map { case (src, dst) => col(src).as(dst) } :+
            col(rightTime).as("__mt")).toSeq: _*)
            .as("__payload")): _*)
    val rAligned = leftCols.foldLeft(rTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lTagged.columns.map(col): _*)
    (lTagged, rAligned)
  }

  private def payloadType(right: DataFrame, rightCols: Seq[(String, String)],
                          rightTime: String) =
    org.apache.spark.sql.types.StructType(
      rightCols.map { case (src, dst) =>
        right.schema(src).copy(name = dst)
      }.toSeq :+ right.schema(rightTime).copy(name = "__mt"))
}
