package graft.plans

/** 128-bit MD5 content digests for heavyweight data embedded in
  * expression trees ([[LmModelRef]], [[CentroidsLongRef]]): Catalyst
  * case-class equality walks every constructor param on every plan
  * transform and sameResult check, so an O(k*dim) matrix or a
  * vocabulary-scale map held structurally makes each of those
  * O(data). A digest computed once (lazily) keeps plan comparison
  * O(1) while two independently built equal values still compare
  * equal — the PersistSlots plan-reuse contract. 128 bits: a digest
  * COLLISION here would alias two different models/centroid sets in
  * sameResult, so the probability must be negligible, not merely
  * small (a 32-bit hashCode alone would not do).
  */
object ContentDigest {

  /** Run `feed` against a fresh MD5 and fold the 16-byte digest to
    * (hi, lo) longs. */
  def md5(feed: Feeder => Unit): (Long, Long) = {
    val f = new Feeder
    feed(f)
    val d = f.md.digest()
    val bb = java.nio.ByteBuffer.wrap(d)
    (bb.getLong, bb.getLong)
  }

  final class Feeder {
    private[ContentDigest] val md =
      java.security.MessageDigest.getInstance("MD5")
    private val buf = java.nio.ByteBuffer.allocate(8)
    def long(v: Long): Unit = {
      buf.clear(); buf.putLong(v)
      md.update(buf.array(), 0, 8)
    }
    def int(v: Int): Unit = long(v.toLong)
    def double(v: Double): Unit = long(java.lang.Double.doubleToLongBits(v))
    def string(s: String): Unit = {
      md.update(s.getBytes("UTF-8")); md.update(0.toByte)
    }
  }
}
