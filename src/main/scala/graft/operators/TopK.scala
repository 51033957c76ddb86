package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Exact per-key top-k without a full rank-window shuffle.
  *
  * The straightforward form — `row_number() OVER (PARTITION BY key
  * ORDER BY score)` then `rank <= k` — shuffles EVERY candidate row to
  * the key's window partition before any row is discarded. At 100 TB
  * that shuffle carries the whole scored candidate set and a single
  * hot key (a query matching many candidates) sorts it all in one
  * task.
  *
  * This operator instead aggregates with a bounded buffer
  * ([[TopK.TopKAgg]], a typed `Aggregator`): Spark plans it as a
  * partial aggregate before the exchange, so each map task forwards AT
  * MOST k rows per key and the final merge sees `numPartitions * k`
  * rows per key, independent of candidate count. The ordering —
  * rounded score descending, id ascending — is a deterministic total
  * order (NaN greatest, as Spark sorts doubles), so the result is
  * bit-identical to the window form; TopKSpec pins that equivalence.
  */
object TopK {

  /** (rounded score desc, id asc) — the deterministic total order the
    * window form sorts by; NaN sorts greatest, as in Spark's double
    * ordering. Operates on the PRE-rounded key carried in the buffer,
    * so the hot path is a primitive compare (rounding happens once
    * per input row, not per comparison). */
  private def better(aKey: Double, aId: Long, bKey: Double, bId: Long): Boolean = {
    val c = java.lang.Double.compare(aKey, bKey)
    if (c != 0) c > 0 else aId < bId
  }

  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Bounded top-k buffer: ordered insert into an at-most-k vector of
    * (id, raw score, rounded order key). k is small (tens), so O(k)
    * insertion beats heap constant factors and keeps the buffer a
    * flat encodable case class. */
  final class TopKAgg(k: Int) extends Aggregator[(Long, Double), TopKBuf, TopKBuf] {
    require(k >= 1, s"top-k requires k >= 1, got $k")

    override def zero: TopKBuf = TopKBuf(Vector.empty)

    private def insert(buf: TopKBuf, id: Long, score: Double, key: Double): TopKBuf = {
      val items = buf.items
      if (items.size == k) {
        val (lastId, _, lastKey) = items.last
        if (!better(key, id, lastKey, lastId)) return buf
      }
      val b = ArrayBuffer.empty[(Long, Double, Double)]
      b ++= items
      var i = 0
      while (i < b.length && better(b(i)._3, b(i)._1, key, id)) i += 1
      b.insert(i, (id, score, key))
      if (b.length > k) b.remove(b.length - 1)
      TopKBuf(b.toVector)
    }

    override def reduce(buf: TopKBuf, in: (Long, Double)): TopKBuf =
      insert(buf, in._1, in._2, round6(in._2))

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      b.items.foldLeft(a) { case (acc, (id, s, key)) => insert(acc, id, s, key) }

    override def finish(r: TopKBuf): TopKBuf = r

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Per-key exact top-k over a scored candidate frame.
    *
    * Contract: `keyCol`/`idCol` must be integral (they are cast to
    * long — non-numeric ids need a surrogate key first), and rows
    * with a null key, id, or score are dropped before ranking (the
    * window form ranked null scores last, where they only surfaced
    * when a key had fewer than k real candidates).
    *
    * @param scored frame with (keyCol: long, idCol: long, scoreCol: double)
    * @return (keyCol, idCol, scoreCol rounded to 4 dp, rank: long) —
    *         the same shape and values as the rank-window form
    */
  def perKey(scored: DataFrame, keyCol: String, idCol: String, scoreCol: String,
             k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    require(k >= 1, s"top-k requires k >= 1, got $k")
    // fail fast on non-integral keys: a fractional double would cast
    // by truncation, silently MERGING distinct keys
    Seq(keyCol, idCol).foreach { c =>
      val dt = scored.schema(c).dataType
      require(Seq("byte", "short", "int", "integer", "long")
        .contains(dt.typeName),
        s"column '$c' must be integral for top-k keys, got ${dt.typeName}")
    }
    val agg = new TopKAgg(k).toColumn
    scored
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .filter(col(keyCol).isNotNull && col(idCol).isNotNull &&
        col(scoreCol).isNotNull)
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("top"))
      .flatMap { case (key, top) =>
        top.items.iterator.zipWithIndex.map { case ((id, s, _), i) =>
          (key, id, s, (i + 1).toLong)
        }
      }
      .toDF(keyCol, idCol, scoreCol, "rank")
      .withColumn(scoreCol, round(col(scoreCol), 4))
  }
}

/** Aggregation buffer: (id, raw score, rounded order key), best first. */
case class TopKBuf(items: Seq[(Long, Double, Double)])
