package graft

import graft.operators.Reputation

/** Per-source reputation on planted corpora: dup-rate counts
  * corpus-wide exact duplicates (cross-source dupes tax BOTH
  * sources), the dominant-language tie breaks lexicographically, and
  * the document gate keeps exactly the reputable sources' docs.
  */
class ReputationSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val sw = Seq("the", "a", "of")

  private def docs = {
    import spark.implicits._
    Seq(
      // good: unique texts, stopword-rich, one lang
      (1L, "the cat sat on a mat of wool", "good", "en"),
      (2L, "a dog ran after the red ball", "good", "en"),
      // spammy: the same text twice (within-source dup), langs split
      (3L, "buy now cheap pills", "spam", "en"),
      (4L, "buy now cheap pills", "spam", "de"),
      // mirror: one doc duplicating a good doc (cross-source dup)
      (5L, "the cat sat on a mat of wool", "mirror", "fr")
    ).toDF("doc_id", "text", "source", "lang")
  }

  test("sourceStats: dup flags are corpus-wide; ties break on lang asc") {
    val got = Reputation.sourceStats(docs, "text", "source",
        "lang", sw)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(5), r.getLong(6))).toSeq
    // good: doc 1 duplicated by the mirror -> 1 of 2 docs dup
    // mirror: its single doc is a dup of good's -> 1/1
    // spam: internal pair -> 2/2; langs en/de tie 1-1 -> 'de' wins asc
    assert(got == Seq(
      ("good", 2L, 1L, "en", 10000L),
      ("mirror", 1L, 1L, "fr", 10000L),
      ("spam", 2L, 2L, "de", 5000L)))
  }

  test("rep_e4 is the exact integer formula") {
    val r = Reputation.sourceStats(docs, "text", "source",
        "lang", sw)
      .filter(col("source") === "spam").collect().head
    val dup = r.getLong(3); val stop = r.getLong(4); val share = r.getLong(6)
    assert(r.getLong(7) == ((10000 - dup) * 5 + stop * 3 + share * 2) / 10)
  }

  test("sourceFilter keeps only docs from sources above the bar") {
    // spam: dup_e4=10000 -> rep collapses; good and mirror mix
    val kept = Reputation.sourceFilter(docs, "text", "source",
        "lang", sw, minRep = 4000L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(!kept.contains(3L) && !kept.contains(4L))
    val all = Reputation.sourceFilter(docs, "text", "source",
        "lang", sw, minRep = 0L).count()
    assert(all == 5L)
  }
}
