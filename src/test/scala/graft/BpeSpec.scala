package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE merge training pinned against hand-computed merges on the
  * classic Sennrich corpus, plus the greedy-overlap edge case.
  */
class BpeSpec extends SparkSpec {

  test("train learns the hand-computed merges on the Sennrich corpus") {
    import spark.implicits._
    // low*5, lower*2, newest*6, widest*3.
    // Round 1 pairs: es 9, st 9, we 8, lo 7, ow 7, ne 6, ew 6,
    //   wi 3, id 3, de 3, er 2 -> tie es/st at 9, lexicographic
    //   tiebreak -> (e, s).
    // Round 2: (es, t) 9. Round 3: (w, est)? newest = n e w est ->
    //   pairs ne 6, ew 6, w-est 6, wi 3, id 3, d-est 3, lo 7, ow 7,
    //   we 2, er 2 -> top lo 7.
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val merges = Bpe.train(wf, "word", "freq", nMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.take(3).toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
    // round 4: after lo: low = lo w (5), lower = lo w e r (2) ->
    //   pairs low 7, ne 6, ew 6, w-est 6, ... -> (lo, w) 7
    assert(merges(3) == ((4, "lo", "w", 7L)))
  }

  test("greedy overlap: (a,a) on aaaa fuses disjoint pairs left to right") {
    import spark.implicits._
    val wf = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("word", "freq")
    // pairs: aaaa has 3 (a,a) adjacencies, aaa has 2 -> cnt 5
    val merges = Bpe.train(wf, "word", "freq", nMerges = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1, "a", "a", 5L)))
  }

  test("segmentWords applies trained merges in rank order") {
    import spark.implicits._
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val merges = Bpe.train(wf, "word", "freq", nMerges = 3)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // after (e,s), (es,t), (l,o)
    val seg = Bpe.segmentWords(wf.select("word"), "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(seg("newest") == Seq("n", "e", "w", "est"))
    assert(seg("widest") == Seq("w", "i", "d", "est"))
    assert(seg("low") == Seq("lo", "w"))
    assert(seg("lower") == Seq("lo", "w", "e", "r"))
  }

  test("early stop: single-char vocabulary yields no merges") {
    import spark.implicits._
    val wf = Seq(("a", 9L), ("b", 3L)).toDF("word", "freq")
    assert(Bpe.train(wf, "word", "freq", nMerges = 5).count() == 0)
  }
}
