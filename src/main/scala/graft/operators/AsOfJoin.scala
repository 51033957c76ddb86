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
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[(String, String)],
               tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    val leftCols = left.columns.toSeq
    val pType = payloadType(right, rightCols, rightTime)

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
    // align schemas: right side lacks left payload columns
    val rAligned = leftCols.foldLeft(rTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lTagged.columns.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
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

  private def payloadType(right: DataFrame, rightCols: Seq[(String, String)],
                          rightTime: String) =
    org.apache.spark.sql.types.StructType(
      rightCols.map { case (src, dst) =>
        right.schema(src).copy(name = dst)
      }.toSeq :+ right.schema(rightTime).copy(name = "__mt"))
}
