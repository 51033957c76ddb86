package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch — approximate frequencies for EVERY key under a
  * fixed memory bound, the complement of [[HeavyHitters]]' exact
  * top-only answer: Misra-Gries tells you *which* terms are hot, a
  * CMS answers point queries ("how often does THIS n-gram / URL /
  * token occur?") for arbitrary keys after one pass, which is what
  * contamination scoring and repetition heuristics ask at 100 TB
  * (the full vocabulary groupBy it replaces has billions of keys).
  *
  * Structure (Cormode & Muthukrishnan 2005): d hash rows x w
  * counters; update adds 1 at (j, h_j(key)) for each row j; estimate
  * is the MIN over rows. Guarantees: estimate >= true count always
  * (counters only over-count), and estimate <= true + eps*n with
  * probability 1-delta for w = ceil(e/eps), d = ceil(ln 1/delta).
  *
  * Determinism discipline: the buffer is a flat Long array and merge
  * is element-wise addition — exact integer sums, so the final
  * sketch is a pure function of the multiset of keys, independent of
  * partitioning and merge order (the same property that makes the
  * HLL/GK bound-check oracles replayable). Hashes are seedless
  * integer double-hashing (see [[bucket]]) — deterministic across
  * runs and JVMs, fast enough that the pass stays scan-bound.
  *
  * Scale shape: one map-combined aggregate whose partial state is
  * d*w longs per task (a few hundred KB), shuffled once to the
  * driver — the sketch never grows with the corpus. Point queries
  * against the returned sketch are driver-side array reads.
  */
object CountMin {

  /** d x w counter grid, flattened row-major. */
  case class CMS(d: Int, w: Int, counters: Array[Long]) {
    def estimate(key: String): Long = {
      var min = Long.MaxValue
      var j = 0
      while (j < d) {
        val c = counters(j * w + CountMin.bucket(j, key, w))
        if (c < min) min = c
        j += 1
      }
      min
    }
  }

  /** Deterministic bucket for hash row j via Kirsch-Mitzenmacher
    * double hashing: h_j = h1 + j*h2 from ONE scan of the key (FNV-1a
    * base, two splitmix64 finalizations). Seedless and stable across
    * runs/JVMs — but, unlike the operators' md5 arithmetic, never
    * needs a SQL twin (estimates are served from the driver-side
    * grid; the oracle checks the BOUND, not the buckets), so the
    * sketch can afford a fast integer hash instead of d md5 digests
    * per token — the difference between the sketch pass running at
    * scan speed and it being md5-bound (a measured 9x at 10x corpus
    * before the switch). */
  private[graft] def bucket(j: Int, key: String, w: Int): Int = {
    val b = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < key.length) { h ^= key.charAt(i); h *= 0x100000001b3L; i += 1 }
      h
    }
    val h1 = mix(b)
    val h2 = mix(b + 0x632be59bd9b4e019L) | 1L // odd: full period mod w
    math.floorMod(h1 + j.toLong * h2, w.toLong).toInt
  }

  // splitmix64 finalizer
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // product-encoded buffer (a bare Array[Long] kryo-encodes to
  // binary, which the result Row then can't hand back as [J); the
  // wrapper aggregator is imperative, so the array mutates in place
  // across rows and encodes only at partial-output boundaries
  private[graft] case class CMSBuf(c: Array[Long])

  private[graft] class CMSAgg(d: Int, w: Int)
      extends Aggregator[String, CMSBuf, CMSBuf] {
    override def zero: CMSBuf = CMSBuf(new Array[Long](d * w))

    override def reduce(buf: CMSBuf, key: String): CMSBuf = {
      var j = 0
      while (j < d) {
        buf.c(j * w + bucket(j, key, w)) += 1L
        j += 1
      }
      buf
    }

    // element-wise Long addition: exact and commutative/associative,
    // so any merge tree yields the same grid
    override def merge(a: CMSBuf, b: CMSBuf): CMSBuf = {
      var i = 0
      while (i < a.c.length) { a.c(i) += b.c(i); i += 1 }
      a
    }

    override def finish(r: CMSBuf): CMSBuf = r
    override def bufferEncoder: Encoder[CMSBuf] = Encoders.product[CMSBuf]
    override def outputEncoder: Encoder[CMSBuf] = Encoders.product[CMSBuf]
  }

  /** One-pass sketch of a string key column. `eps` bounds the
    * overestimate (<= eps * n with prob 1 - delta); defaults give a
    * 4 x 2719 grid (~87 KB). */
  def sketch(df: DataFrame, keyCol: String,
             eps: Double = 0.001, delta: Double = 0.02): CMS = {
    val w = math.ceil(math.E / eps).toInt
    val d = math.ceil(math.log(1.0 / delta)).toInt
    val agg = udaf(new CMSAgg(d, w), Encoders.STRING)
    val grid = df.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)
      .agg(agg(col("k")).as("sketch"))
      .head().getStruct(0).getSeq[Long](0).toArray
    CMS(d, w, grid)
  }

  /** Streaming ingest: fold micro-batches into one grid via
    * `writeStream.foreachBatch(acc.ingest(_, keyCol, _))`. Because
    * the grid is an exact element-wise sum, the accumulated sketch is
    * BIT-IDENTICAL to a batch [[sketch]] over the concatenated data
    * — no approximation drift from micro-batching, the property that
    * lets one monitoring sketch serve both the backfill and the live
    * stream. State is d*w longs on the driver, constant in stream
    * length. (At-least-once recovery can replay a batch; ingest is
    * idempotent per batchId via the `seen` guard.) */
  final class SketchAccumulator(eps: Double = 0.001, delta: Double = 0.02) {
    private val w = math.ceil(math.E / eps).toInt
    private val d = math.ceil(math.log(1.0 / delta)).toInt
    private val grid = new Array[Long](d * w)
    private val seen = scala.collection.mutable.Set.empty[Long]

    /** foreachBatch body: one map-combined agg over the micro-batch,
      * then an element-wise driver merge. */
    def ingest(batch: DataFrame, keyCol: String, batchId: Long): Unit =
      synchronized {
        if (!seen.add(batchId)) return
        val b = CountMin.sketch(batch, keyCol, eps, delta)
        var i = 0
        while (i < grid.length) { grid(i) += b.counters(i); i += 1 }
      }

    def snapshot: CMS = synchronized(CMS(d, w, grid.clone()))
  }
}
