package graft

import org.apache.spark.sql.functions._

/** Equivalence contract for the SAMPLED sketch-quality eval
  * (dedup_pr_eval): on a small corpus the full exact-Jaccard ground
  * truth is computable, so the sampled estimate is pinned against it
  * — precision must be IDENTICAL (the precision leg is a census, not
  * a sample), and the true recall must fall inside the sampled leg's
  * half-sample 95% interval. Runs at sf0.001 only: the full-exact
  * form is the all-pairs-shaped cost the sampled query exists to
  * avoid at bench scale.
  */
class PrEvalSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("sampled eval: precision census identical to the exact form") {
    val exact = graft.queries.DedupQueries.prEvalExact(docs).collect().head
    val sampled = graft.queries.DedupQueries.prEvalSampled(docs).collect().head
    assert(sampled.getAs[Long]("n_approx") == exact.getAs[Long]("n_approx"))
    assert(sampled.getAs[Long]("tp") == exact.getAs[Long]("tp"))
    assert(sampled.getAs[Long]("precision_e4") ==
      exact.getAs[Long]("precision_e4"))
  }

  test("sampled eval: true recall falls inside the half-sample 95% CI") {
    val exact = graft.queries.DedupQueries.prEvalExact(docs).collect().head
    val sampled = graft.queries.DedupQueries.prEvalSampled(docs).collect().head
    val trueRecall = exact.getAs[Long]("recall_e4").toDouble / 10000.0
    val lo = sampled.getAs[Double]("rec_lo95")
    val hi = sampled.getAs[Double]("rec_hi95")
    assert(lo <= hi)
    assert(trueRecall >= lo - 1e-9 && trueRecall <= hi + 1e-9,
      s"true recall $trueRecall outside sampled CI [$lo, $hi]")
    // the sample must actually be a sample: strictly fewer ground
    // truth pairs than the full form counts (md5 1/4 keying)
    assert(sampled.getAs[Long]("n_truth_sample") <=
      exact.getAs[Long]("n_exact"))
    assert(sampled.getAs[Long]("n_truth_sample") > 0)
  }

  test("sampled ground-truth pairs are exactly the md5-keyed subset") {
    val full = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id",
        "text", shingleLen = 3, minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard")
    val sampledKeys = full.filter(
      conv(substring(md5(col("id_a").cast("string")), 1, 8), 16, 10)
        .cast("long") % 4 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = graft.operators.Dedup.ngramJaccardPairsSampled(docs, "doc_id",
        "text", shingleLen = 3, minJaccard = 0.5, sampleMod = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == sampledKeys)
  }

  test("capped recall frame: cap bites on a planted stop-shingle, " +
    "recall-estimate bias vs the uncapped truth is ~0") {
    // the synthetic corpus has max shingle df = 9 — no natural
    // stop-shingle — so plant one: the same boilerplate footer on
    // EVERY document (df = 500 for its interior shingles). This is
    // the pathological fan-out the cap exists for: uncapped, the
    // recall frame's shared-shingle self-join grows a 500^2-shaped
    // bucket on those tokens.
    val planted = docs.withColumn("text",
      concat(col("text"),
        lit(" standard legal boilerplate footer notice applies here")))
    val cap = 50
    def truthPairs(maxDf: Int) = graft.operators.Dedup
      .ngramJaccardPairsSampled(planted, "doc_id", "text",
        shingleLen = 3, minJaccard = 0.5, sampleMod = 4, maxDocFreq = maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = truthPairs(Int.MaxValue)
    val capped = truthPairs(cap)
    assert(uncapped.nonEmpty)
    // the sketch leg, unchanged (same pairs both recalls score;
    // same K/bands as dedup_pr_eval)
    val sketch = graft.operators.Dedup.minhashPairs(planted, "doc_id",
        "text", numHashes = 12, bands = 4, minEstimate = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(truth: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 0.0
      else truth.count(sketch.contains).toDouble / truth.size
    val bias = recall(capped) - recall(uncapped)
    assert(math.abs(bias) <= 0.05,
      s"capped-truth recall bias $bias (cap=$cap, " +
        s"|uncapped|=${uncapped.size}, |capped|=${capped.size})")
    // the cap must actually have bitten — otherwise this spec proves
    // nothing (guard against fixture drift): the planted footer's
    // interior shingle must have df = |corpus| >> cap
    val footerDf = planted
      .select(col("doc_id"), explode(graft.functions.TextFunctions
        .shinglesOfWords(graft.functions.TextFunctions.words(col("text")), 3))
        .as("tok"))
      .filter(col("tok") === "legal boilerplate footer")
      .select(col("doc_id")).distinct().count()
    assert(footerDf > cap,
      s"planted stop-shingle df $footerDf does not exceed cap $cap")
  }

  test("exactJaccardFor: zero-shingle doc comes back jaccard 0, not dropped") {
    import spark.implicits._
    // doc 2's text is shorter than the shingle length -> zero
    // shingles; the pair must STILL come back, with jaccard 0
    // (the docstring contract — was silently dropped by the inner
    // counts join before round 13)
    val tiny = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "xy"),
      (3L, "alpha beta gamma delta zeta")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val got = graft.operators.Dedup.exactJaccardFor(pairs, tiny, "doc_id",
        "text", shingleLen = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(got.size == 3, s"pairs dropped: $got")
    assert(got((1L, 2L)) == 0.0)
    assert(got((2L, 3L)) == 0.0)
    assert(got((1L, 3L)) > 0.0)
  }

  test("exactJaccardFor agrees with the pair frame on shared pairs " +
    "and zeroes band-collision pairs") {
    val full = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id",
        "text", shingleLen = 3, minJaccard = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    import spark.implicits._
    val ids = docs.select(col("doc_id")).limit(6)
      .collect().map(_.getLong(0)).sorted
    val pairs = (for (a <- ids; b <- ids if a < b) yield (a, b))
      .toSeq.toDF("id_a", "id_b")
    val got = graft.operators.Dedup.exactJaccardFor(pairs, docs, "doc_id",
        "text", shingleLen = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    got.foreach { case (k, j) =>
      assert(j == full.getOrElse(k, 0.0), s"pair $k")
    }
    assert(got.length == pairs.count())
  }
}
