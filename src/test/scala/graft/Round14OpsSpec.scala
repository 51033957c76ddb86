package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 behavior pins: the media-fixture decode parallelization
  * (r13 verdict "What's wrong #1") and the vocab-coverage
  * degenerate-corpus guard (r13 ADVICE).
  */
class Round14OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("media payload fixtures read back at session parallelism, not as " +
    "one task (the serial-decode fix)") {
    val want = spark.sparkContext.defaultParallelism
    // every decode-bound corpus: the stage ABOVE the codec UDFs must
    // have one partition per core, or a 32-thread box decodes on 1
    val imgs = MultimodalQueries.structuredImages(spark, sf)
    assert(imgs.rdd.getNumPartitions == want,
      s"structuredImages partitions=${imgs.rdd.getNumPartitions}, want $want")
    val wavs = MultimodalQueries.structuredWavs(spark, sf)
    assert(wavs.rdd.getNumPartitions == want,
      s"structuredWavs partitions=${wavs.rdd.getNumPartitions}, want $want")
    val gifs = MultimodalQueries.structuredVideos(spark, sf)
    assert(gifs.rdd.getNumPartitions == want,
      s"structuredVideos partitions=${gifs.rdd.getNumPartitions}, want $want")
    // and the repartition changes no rows: fingerprints over the
    // parallel read still find the engineered near-dup pairs
    val pairs = MultimodalQueries.queries("mm_audio_fp")(spark, sf)
    assert(pairs.count() > 0, "near-dup pairs vanished after repartition")
  }

  test("domainReweightStep: hard domains gain share, shares stay " +
    "normalized, unscored domains keep base share") {
    import spark.implicits._
    // three domains: "hard" scores 2x the corpus-mean NLL, "easy"
    // below it, "meta" has no scored docs at all (n_scored = 0)
    val perDoc = Seq(
      ("hard", 100L, Some(3000000L)), ("hard", 100L, Some(3000000L)),
      ("easy", 100L, Some(1000000L)), ("easy", 100L, Some(1000000L)),
      ("meta", 200L, None)
    ).toDF("source", "n_tok", "avg_nll_e6")
    val out = graft.operators.Mixture.domainReweightStep(
        perDoc, "source", "avg_nll_e6", "n_tok", etaE0 = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    // corpus mean = 2e6; excess: hard 1e6, easy 0, meta 0
    assert(out("hard").getLong(5) == 1000000L)
    assert(out("easy").getLong(5) == 0L)
    assert(out("meta").getLong(5) == 0L)
    assert(out("meta").isNullAt(4), "unscored domain mean must be NULL")
    // base shares e6: hard 1/3, easy 1/3, meta 1/3 of 600 tokens
    assert(out.values.map(_.getLong(6)).toSeq.distinct == Seq(333333L))
    // hard's boost term is 3x (1e6 + 2*1e6); easy/meta stay at 1x ->
    // new shares 3/5, 1/5, 1/5 up to flooring
    val shares = Map("hard" -> out("hard").getLong(7),
      "easy" -> out("easy").getLong(7), "meta" -> out("meta").getLong(7))
    assert(shares("hard") == 6000L, shares)
    assert(shares("easy") == 2000L && shares("meta") == 2000L, shares)
    assert(shares.values.sum <= 10000L)
  }

  test("domainReweightStep: 40-case randomized differential vs a pure-Scala " +
    "replay (shares normalized, floor-exact)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    (1 to 40).foreach { case_i =>
      val nDom = 1 + rnd.nextInt(6)
      val eta = rnd.nextInt(4).toLong
      val rows = (0 until nDom).flatMap { d =>
        (0 until 1 + rnd.nextInt(4)).map { _ =>
          (s"d$d", rnd.nextInt(500).toLong,
            if (rnd.nextInt(4) == 0) None
            else Some(rnd.nextInt(5000000).toLong))
        }
      }
      val out = graft.operators.Mixture.domainReweightStep(
          rows.toDF("source", "n_tok", "avg_nll_e6"),
          "source", "avg_nll_e6", "n_tok", etaE0 = eta)
        .collect().map(r => r.getString(0) -> r).toMap
      // independent replay in plain Scala (floor = BigInt quot on
      // nonnegative operands, same as both engines' integer div)
      val byDom = rows.groupBy(_._1)
      val scoredAll = rows.flatMap(_._3)
      val gOpt = if (scoredAll.nonEmpty)
        Some(scoredAll.sum / scoredAll.size) else None
      val tt = rows.map(_._2).sum
      val exp = byDom.map { case (dom, rs) =>
        val scored = rs.flatMap(_._3)
        val mean = if (scored.nonEmpty) Some(scored.sum / scored.size) else None
        val excess = (mean, gOpt) match {
          case (Some(m), Some(g)) => math.max(m - g, 0L)
          case _ => 0L
        }
        val base = if (tt > 0) rs.map(_._2).sum * 1000000L / tt else 0L
        dom -> (mean, excess, base, base * (1000000L + eta * excess))
      }
      val sw = exp.values.map(_._4).sum
      exp.foreach { case (dom, (mean, excess, base, w)) =>
        val r = out(dom)
        assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) == mean,
          s"case $case_i $dom mean")
        assert(r.getLong(5) == excess, s"case $case_i $dom excess")
        assert(r.getLong(6) == base, s"case $case_i $dom base")
        val want = if (sw > 0)
          (BigInt(w) * 10000 / BigInt(sw)).toLong else 0L
        assert(r.getLong(7) == want, s"case $case_i $dom share")
      }
      val total = out.values.map(_.getLong(7)).sum
      assert(total <= 10000L && (sw == 0 || total > 10000L - nDom),
        s"case $case_i share sum $total")
    }
  }

  test("domainReweightStep: a NULL domain normalizes against the GLOBAL " +
    "weight sum (review finding: NULL partition key split the window)") {
    import spark.implicits._
    val perDoc = Seq(
      (Option("a"), 100L, Some(3000000L)),
      (Option("a"), 100L, Some(3000000L)),
      (Option.empty[String], 200L, Some(1000000L)),
      (Option.empty[String], 200L, Some(1000000L))
    ).toDF("source", "n_tok", "avg_nll_e6")
    val out = graft.operators.Mixture.domainReweightStep(
        perDoc, "source", "avg_nll_e6", "n_tok", etaE0 = 2L)
      .collect().map(r =>
        (if (r.isNullAt(0)) "<null>" else r.getString(0)) -> r.getLong(7))
      .toMap
    // mean 2e6; "a": excess 1e6, base 1/3 -> w = 1/3 * 3e6;
    // NULL: excess 0, base 2/3 -> w = 2/3 * 1e6. shares 6000 / 4000.
    assert(out == Map("a" -> 6000L, "<null>" -> 4000L), out)
    assert(out.values.sum == 10000L,
      "NULL-domain row must share the global normalizer")
  }

  test("kAnonymityProfile: group-size histogram with sub-k classes flagged") {
    import spark.implicits._
    val df = Seq(
      ("a", "en"), ("a", "en"), ("a", "en"),     // class of 3
      ("b", "en"), ("b", "en"), ("b", "en"),     // class of 3
      ("c", "de"),                               // singleton
      ("d", "fr"), ("d", "fr"), ("d", "fr"),
      ("d", "fr"), ("d", "fr")                   // class of 5
    ).toDF("src", "lang")
    val out = graft.operators.Expectations.kAnonymityProfile(
        df, Seq($"src", $"lang"), kMin = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(3L) == ((2L, 6L, 1)))
    assert(out(1L) == ((1L, 1L, 1)))
    assert(out(5L) == ((1L, 5L, 0)))
  }

  test("scoreEnsemble: fused one-scan scorer equals the separate " +
    "perceptron and NB scorers value-for-value") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("__y", when(col("lang") === "en", 1).otherwise(-1))
    val w = graft.operators.Quality.trainPerceptron(
      docs, "text", "__y", buckets = 512, epochs = 2)
    val nb = graft.operators.Quality.trainNaiveBayes(
      docs, "text", "__y", buckets = 512)
    val fused = graft.operators.Quality
      .scoreEnsemble(docs, "doc_id", "text", w, nb)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    val lin = graft.operators.Quality.scoreLinear(docs, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    val nbs = graft.operators.Quality.scoreNaiveBayes(docs, "doc_id", "text", nb)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(fused.keySet == lin.keySet && fused.keySet == nbs.keySet)
    fused.foreach { case (id, (score, scoreE6, keepLin, keepNb)) =>
      assert((score, keepLin) == lin(id), s"doc $id linear")
      assert((scoreE6, keepNb) == nbs(id), s"doc $id nb")
    }
  }

  test("q_vocab_coverage: a corpus with zero bigrams emits zero rows " +
    "(matches the oracle's empty legs)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab_degen")
    try {
      // single-word texts -> no word bigrams -> empty frequency frame
      spark.range(5).select(col("id").as("doc_id"), lit("solo").as("text"),
          lit("src0").as("source"), lit("en").as("lang"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = TextQueries.queries("q_vocab_coverage")(spark, dir.toString)
      assert(out.count() == 0,
        "degenerate corpus must not emit count=0/null coverage rows")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
