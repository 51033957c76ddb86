package graft

import graft.operators.{BloomJoin, Dedup, ZOrder}
import org.apache.spark.sql.functions._

/** Round-2 operators: bloom pre-join, z-order layout, edit-distance
  * dedup. */
class Round2OpsSpec extends SparkSpec {
  import spark.implicits._

  test("BloomJoin.join equals the plain join") {
    val probe = (1L to 1000L).map(i => (i, s"p$i")).toDF("k", "pv")
    val build = (1L to 1000L by 50L).map(i => (i, s"b$i")).toDF("bk", "bv")
    val got = BloomJoin.join(probe, build, "k", "bk")
      .select("k", "pv", "bv").orderBy("k").collect().toSeq
    val want = probe.join(build, col("k") === col("bk"))
      .select("k", "pv", "bv").orderBy("k").collect().toSeq
    assert(got == want && got.size == 20)
  }

  test("BloomJoin prunes most non-matching probe rows pre-join") {
    val probe = (1L to 10000L).toDF("k")
    val build = Seq(5L, 500L, 5000L).toDF("bk")
    val bloom = build.stat.bloomFilter("bk", 3, 0.01)
    val kept = probe.collect().map(_.getLong(0)).count(bloom.mightContainLong)
    // 0.01 fpp over 10k rows: expect ~matches + ~100 false positives
    assert(kept >= 3 && kept < 500, s"kept=$kept")
  }

  test("zvalue2 interleaves bits (known values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .select(ZOrder.zvalue2(col("x"), col("y"), 8).as("z"))
    // interleave(3=0b011, 5=0b101) = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 0b100111
    assert(df.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 39L, 65535L))
  }

  test("z-order locality: a 2^(2b)-sized curve bucket bounds both dims to 2^b") {
    val pts = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val spans = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        floor(ZOrder.zvalue2(col("x"), col("y"), 8) / 4096).as("zb"))
      .groupBy("zb")
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .agg(max(col("sx")), max(col("sy"))).as[(Long, Long)].head()
    // 4096 = 2^12 covers 6 bits per dimension -> span <= 63 in each
    assert(spans == ((63L, 63L)))
  }

  test("editDistancePairs matches brute force (banding is complete)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // dist 3 to 1
      (3L, "the quick brown fox jumped over a lazy dog"),
      (4L, "completely different text that matches nothing else here"),
      (5L, "the quick brown fox jumps over the lazy dog")) // dist 0 to 1
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("id", "text", "len")
    val got = Dedup.editDistancePairs(docs, "id", "text", "len",
        maxDist = 5, prefixLen = 40, lenBucket = 16)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    val all = docs.select("id", "text", "len").as[(Long, String, Long)].collect()
    val brute = for {
      (ia, ta, la) <- all.toSeq; (ib, tb, lb) <- all.toSeq
      if ia < ib && math.abs(la - lb) <= 5
      d = {
        val (pa, pb) = (ta.trim.toLowerCase.take(40), tb.trim.toLowerCase.take(40))
        levDist(pa, pb)
      }
      if d <= 5
    } yield (ia, ib, d.toLong)
    assert(got == brute.sortBy(p => (p._1, p._2)))
    assert(got.map(p => (p._1, p._2)).contains((1L, 5L)))
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
