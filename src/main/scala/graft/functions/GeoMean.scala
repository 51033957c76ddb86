package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Geometric mean as a typed `Aggregator` — the engine's
  * user-defined-aggregate surface (the reference's only extension
  * point is its ingestion Converter, SURVEY.md §2.6; Spark's is
  * `Aggregator`/UDAF, shown here end to end).
  *
  * The buffer is (sum of logs, count), so the aggregate composes the
  * way every distributed aggregate must: `reduce` folds rows inside
  * a partition, `merge` combines partition buffers — Catalyst plans
  * it as partial + final hash aggregation, one map-combined shuffle,
  * identical shape to the built-in `avg`. exp(avg(ln x)) is also
  * exactly what a SQL oracle computes, so the operator stays
  * hash-checkable (rounded — summation order differs by partitioning,
  * absorbed at 4 dp).
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1L)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form, usable in any `agg(...)`. */
  def geoMean(c: Column): Column = udaf(GeoMean).apply(c)
}
