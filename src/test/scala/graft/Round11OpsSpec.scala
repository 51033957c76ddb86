package graft

import org.apache.spark.sql.functions._

/** Round-11 operators: the min-K% prob membership signal over the
  * order-N LM.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("minKProbNll selects the costliest k% tokens: exact expectations " +
    "from the scorer's own formulas") {
    import graft.operators.LanguageModel
    val ref = Seq("a b a b a b c").toDF("text")
    val m = LanguageModel.trainNgrams(ref, "text", order = 2)
    def cost(r: Double) = math.floor(1000000.0 * -math.log(r)).toLong
    // "a b a b q a": positions (a b)(b a)(a b)(b q)(q a) — two cheap
    // seen bigrams twice, one unknown-word spike, one unigram backoff
    val costs = Seq(
      cost(m.tables(1)("a b").toDouble / m.tables(0)("a").toDouble),
      cost(m.tables(1)("b a").toDouble / m.tables(0)("b").toDouble),
      cost(m.tables(1)("a b").toDouble / m.tables(0)("a").toDouble),
      cost(0.4 / (m.total.toDouble * 10.0)),                    // q unknown
      cost(0.4 * (m.tables(0)("a").toDouble / m.total.toDouble)))
    val out = LanguageModel.minKProbNll(
        Seq((1L, "a b a b q a")).toDF("doc_id", "text"),
        "doc_id", "text", m, kPct = 20)
      .collect().head
    // n_scored = 5, k_used = max(1, 5*20/100) = 1 -> the single
    // costliest position (the unknown-word spike)
    assert(out.getLong(1) == 5L)
    assert(out.getLong(2) == 1L)
    assert(out.getLong(3) == costs.max)
    // kPct = 60 -> k_used = 3 -> mean of the three costliest
    val top3 = costs.sorted.reverse.take(3)
    val out60 = LanguageModel.minKProbNll(
        Seq((1L, "a b a b q a")).toDF("doc_id", "text"),
        "doc_id", "text", m, kPct = 60)
      .collect().head
    assert(out60.getLong(2) == 3L)
    assert(out60.getLong(3) == top3.sum / 3L)
  }

  test("minKProbNll at kPct=100 equals ngramNllNarrow's average " +
    "on the real fixture") {
    import graft.operators.LanguageModel
    val docs = graft.queries.Tables(spark, sfDir, "documents")
    val m = LanguageModel.trainNgrams(
      docs.filter(col("doc_id") % 5 === 0), "text", order = 2)
    val all = LanguageModel.minKProbNll(docs, "doc_id", "text", m, kPct = 100)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val avg = LanguageModel.ngramNllNarrow(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(all.nonEmpty)
    assert(all == avg)
  }

  test("minKProbNll separates a memorized doc from a perturbed twin " +
    "more sharply than the full-document mean") {
    import graft.operators.LanguageModel
    val ref = Seq("the quick brown fox jumps over the lazy dog again and again")
      .toDF("text")
    val m = LanguageModel.trainNgrams(ref, "text", order = 2)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // member
      (2L, "the quick brown fox zzz over the lazy dog"))   // edited leak
      .toDF("doc_id", "text")
    val mk = LanguageModel.minKProbNll(docs, "doc_id", "text", m, kPct = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val full = LanguageModel.ngramNllNarrow(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // both statistics rank member < edited, but the min-k gap is the
    // larger one (the spike isn't washed out by fluent context)
    assert(mk(1L) < mk(2L) && full(1L) < full(2L))
    assert(mk(2L) - mk(1L) > full(2L) - full(1L))
  }
}
