package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) detection over corpus tokens — the
  * sketch-first pattern for skew discovery at 100 TB: a full
  * `groupBy(term)` materializes the whole vocabulary (billions of
  * keys for web text) just to find the handful of hot terms, where a
  * bounded Misra-Gries summary finds every candidate in ONE pass
  * with k counters per task.
  *
  * Two passes, exact output:
  *  1. the MG sketch as a partial aggregate (each task carries ≤ k
  *     (term, count) entries; merges subtract the (k+1)-th largest
  *     count — the mergeable-summaries form of Agarwal et al. 2012,
  *     which keeps the estimate within n/(k+1) of the true count
  *     under arbitrary merge trees). The driver receives ≤ k
  *     candidate terms — bounded by a parameter, not the vocabulary.
  *  2. exact counts of the candidates only (narrow `isin` filter +
  *     a ≤ k-key aggregate), keeping terms with `count·k > n` — an
  *     exact integer comparison.
  *
  * The MG guarantee makes the candidate set a SUPERSET of every term
  * with true frequency > n/(k+1) ⊇ > n/k, so the exact second pass
  * yields a deterministic result independent of partitioning or
  * merge order — the sketch decides only how much work pass 2 does,
  * never the answer (the q_approx_distinct / q_approx_quantile
  * bound-check discipline, strengthened to exactness).
  */
object HeavyHitters {

  private[graft] case class MGBuf(items: Map[String, Long])

  private[graft] class MisraGries(k: Int)
      extends Aggregator[String, MGBuf, MGBuf] {
    override def zero: MGBuf = MGBuf(Map.empty)

    // the buffer object lives across rows (typed aggregation only
    // serializes at partial-output boundaries), so the per-token cost
    // is one hash lookup + one persistent-map update; the O(k)
    // decrement-all fires at most n/(k+1) times in a stream of n
    // tokens (each event retires k+1 units of total count) and
    // amortizes to O(1)
    override def reduce(buf: MGBuf, term: String): MGBuf =
      buf.items.get(term) match {
        case Some(c) => MGBuf(buf.items.updated(term, c + 1L))
        case None if buf.items.size < k =>
          MGBuf(buf.items.updated(term, 1L))
        case None => MGBuf(buf.items.collect {
          case (t, c) if c > 1L => (t, c - 1L)
        })
      }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val m = b.items.foldLeft(a.items) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (m.size <= k) MGBuf(m)
      else {
        val cut = m.values.toVector.sorted(Ordering[Long].reverse)(k)
        MGBuf(m.collect {
          case (t, c) if c - cut > 0L => (t, c - cut)
        })
      }
    }

    override def finish(r: MGBuf): MGBuf = r
    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  }

  /** Terms whose corpus frequency exceeds n/k, with exact counts.
    * `k` bounds both the sketch size and the frequency threshold. */
  def frequentTerms(docs: DataFrame, textCol: String, k: Int = 64)
  : DataFrame = {
    import graft.functions.TextFunctions.words
    require(k >= 2, s"heavy hitters need k >= 2, got $k")
    val toks = docs.select(explode(words(col(textCol))).as("term"))
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    val row = toks
      .agg(mg(col("term")).as("sketch"), count(lit(1)).as("n")).head()
    val cands = row.getStruct(0).getMap[String, Long](0).keys.toSeq
    val n = row.getLong(1)
    if (cands.isEmpty) // empty corpus: nothing can exceed n/k
      return toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .filter(lit(false))
    toks.filter(col("term").isin(cands: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > lit(n))
  }
}
