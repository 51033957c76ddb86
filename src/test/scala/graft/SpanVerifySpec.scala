package graft

import graft.operators.Dedup

/** Collision-verified exact-substring dedup (round 15).
  *
  * dedup_spans / dedup_span_remove key duplication on a 48-bit span
  * hash. At 100 TB-scale span counts (far beyond 2^24) birthday
  * collisions fold unrelated spans together, and on the remove path
  * that scrubs innocent text. The verified variants join the
  * hash-matched candidates back to the actual word slices and
  * recount occurrence on the span TEXT. These specs pin both halves:
  *
  *  - an ENGINEERED collision (two different 8-word spans sharing a
  *    deliberately narrowed 4-bit hash prefix) is NOT counted as a
  *    duplicate and NOT scrubbed by the verified ops;
  *  - genuine duplicated spans (whole-doc and mid-document, across
  *    documents) are counted and scrubbed exactly as before;
  *  - at the production 48-bit key, on a collision-free corpus, the
  *    verified ops are row-for-row identical to the unverified ones.
  */
class SpanVerifySpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Eight distinct words with prefix `p`, space-joined. */
  private def span8(p: String): String = (0 until 8).map(i => s"$p$i").mkString(" ")

  test("engineered 4-bit collision: verified stats/remove do not fold two " +
    "different spans, genuine duplicates still count") {
    val spanA = span8("xa")
    // brute-force a DIFFERENT span whose md5 first hex digit (the
    // narrowed 4-bit key) matches spanA's — expected ~16 tries
    val target = md5hex(spanA).substring(0, 1)
    val spanB = Iterator.from(0).map(k => span8(s"yb$k"))
      .find(s => md5hex(s).substring(0, 1) == target).get
    assert(spanB != spanA)
    assert(md5hex(spanB).substring(0, 1) == md5hex(spanA).substring(0, 1),
      "engineered collision must hold — the hash keys ARE equal")
    // an unverified hash-keyed count at this width would see occ=2
    // for both spans and flag/scrub them; the verified ops must not
    val dupSpan = span8("dd")
    val df = Seq(
      (1L, spanA),            // collides with doc 2 in the 4-bit key
      (2L, spanB),            // ... but the text differs
      (3L, span8("uu")),      // unique, may or may not hash-collide
      (4L, dupSpan),          // genuine whole-doc duplicate pair
      (5L, dupSpan)
    ).toDF("doc_id", "text")

    val stats = Dedup.dupSpanStatsVerifiedHashed(df, "doc_id", "text", 8, 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats(1L) == (1L, 0L), s"collision counted as dup: ${stats(1L)}")
    assert(stats(2L) == (1L, 0L), s"collision counted as dup: ${stats(2L)}")
    assert(stats(3L)._2 == 0L)
    assert(stats(4L) == (1L, 1L))
    assert(stats(5L) == (1L, 1L))

    val rm = Dedup.dupSpanRemoveVerifiedHashed(df, "doc_id", "text", 8, 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rm(1L) == spanA, "collision must NOT scrub innocent text")
    assert(rm(2L) == spanB, "collision must NOT scrub innocent text")
    assert(rm(4L) == "" && rm(5L) == "", "genuine duplicates still scrubbed")
  }

  test("mid-document duplicated span: pos/slice reconstruction scrubs the " +
    "covered words only") {
    // doc 6 = 11 words; its 8-word suffix (positions 3..10, 0-based
    // start 3) appears verbatim as doc 7 — the one duplicated span
    val prefix = "p q r"
    val shared = span8("sv")
    val df = Seq(
      (6L, s"$prefix $shared"),
      (7L, shared)
    ).toDF("doc_id", "text")
    val stats = Dedup.dupSpanStatsVerified(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats(6L) == (4L, 1L), s"got ${stats(6L)}")
    assert(stats(7L) == (1L, 1L))
    val rm = Dedup.dupSpanRemoveVerified(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rm(6L) == prefix, s"got '${rm(6L)}'")
    assert(rm(7L) == "")
  }

  test("at the production 48-bit key, verified == unverified on a " +
    "collision-free mixed corpus (differential)") {
    val docs = Seq(
      (10L, span8("aa") + " tail0 tail1"),
      (11L, span8("aa")),                  // dup of 10's prefix span
      (12L, span8("zz")),                  // unique
      (13L, "short doc"),                  // no spans
      (14L, ""),                           // empty
      (15L, span8("mm") + " " + span8("mm")) // within-doc repeat
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(Dedup.dupSpanStatsVerified(docs, "doc_id", "text")) ==
      rows(Dedup.dupSpanStats(docs, "doc_id", "text")))
    assert(rows(Dedup.dupSpanRemoveVerified(docs, "doc_id", "text")) ==
      rows(Dedup.dupSpanRemove(docs, "doc_id", "text")))
  }
}
