package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

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
  * HLL/GK bound-check oracles replayable). Hashes are md5-derived
  * (row j hashes "j:key"), seedless and engine-stable.
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

  /** Engine-stable bucket for hash row j: first 12 md5 hex chars of
    * "j:key" as an integer, mod w — [[graft.operators.Packing.hash48]]
    * computed JVM-side (the sketch is queried on the driver, so the
    * hash never needs a SQL twin; md5 keeps it seedless and
    * reproducible across runs and languages). */
  private[graft] def bucket(j: Int, key: String, w: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest((j + ":" + key).getBytes(StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % w).toInt
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
}
