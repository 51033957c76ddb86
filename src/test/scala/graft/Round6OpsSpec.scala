package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Quality, Sampling}

/** Planted-data behavior specs for the round-6 curation operators:
  * duplicated-span detection and DSIR-style importance selection.
  * (Both are additionally hash-pinned against DuckDB via the
  * dedup_spans / q_dsir oracles.)
  */
class Round6OpsSpec extends SparkSpec {

  import spark.implicits._

  private def doc(n: Int, seed: Int): String =
    (1 to n).map(t => s"s${seed}w$t").mkString(" ")

  test("dupSpanStats counts exactly the planted shared spans") {
    // doc 1 and doc 2 share one 10-word run embedded in otherwise
    // disjoint text; doc 3 is fully unique; doc 4 is too short for
    // any span. spanLen=8 -> a shared 10-word run contributes 3
    // shared 8-grams per doc; border 8-grams mixing run and private
    // words differ between the docs.
    val run = (1 to 10).map(t => s"dupw$t").mkString(" ")
    val docs = Seq(
      (1L, doc(20, 1) + " " + run + " " + doc(20, 11)),
      (2L, doc(20, 2) + " " + run + " " + doc(20, 12)),
      (3L, doc(40, 3)),
      (4L, doc(5, 4))
    ).toDF("doc_id", "text")
    val rows = Dedup.dupSpanStats(docs, "doc_id", "text", spanLen = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // 50 words -> 43 spans of length 8; 3 of them lie inside the run
    assert(rows(1L) == ((43L, 3L, math.floor(3.0 / 43 * 10000).toLong)))
    assert(rows(2L) == ((43L, 3L, math.floor(3.0 / 43 * 10000).toLong)))
    assert(rows(3L) == ((33L, 0L, 0L)))
    // total annotation: the span-less doc still appears, with zeros
    assert(rows(4L) == ((0L, 0L, 0L)))
  }

  test("dupSpanStats counts within-document repetition as duplication") {
    val run = (1 to 8).map(t => s"repw$t").mkString(" ")
    // the same 8-gram occurs twice in ONE doc (boilerplate loop)
    val docs = Seq(
      (1L, run + " " + doc(10, 5) + " " + run),
      (2L, doc(30, 6))
    ).toDF("doc_id", "text")
    val r1 = Dedup.dupSpanStats(docs, "doc_id", "text", spanLen = 8)
      .filter(col("doc_id") === 1L).head()
    assert(r1.getLong(2) == 2L, "both occurrences of the repeated span count")
  }

  test("importanceVotes prefers target-vocabulary documents") {
    // target exemplars draw from vocabulary T; raw corpus mixes
    // T-docs with B-docs. Every T word outvotes its raw frequency in
    // the target table, so T-docs must score positive and keep=1,
    // B-docs negative and keep=0.
    val tDoc = (1 to 40).map(t => s"tw${t % 12}").mkString(" ")
    val bDoc = (1 to 40).map(t => s"bw${t % 12}").mkString(" ")
    val raw = Seq(
      (1L, tDoc), (2L, tDoc), (3L, bDoc), (4L, bDoc), (5L, tDoc)
    ).toDF("doc_id", "text")
    val target = Seq((100L, tDoc), (101L, tDoc)).toDF("doc_id", "text")
    val rows = Sampling.importanceVotes(raw, target, "doc_id", "text",
        buckets = 256)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    Seq(1L, 2L, 5L).foreach { id =>
      assert(rows(id)._1 > 0 && rows(id)._2 == 1, s"doc $id should keep")
    }
    Seq(3L, 4L).foreach { id =>
      assert(rows(id)._1 < 0 && rows(id)._2 == 0, s"doc $id should drop")
    }
    // n_words is the full token count
    val nw = Sampling.importanceVotes(raw, target, "doc_id", "text", 256)
      .filter(col("doc_id") === 1L).head().getLong(1)
    assert(nw == 40L)
  }

  test("dupSpanRemove scrubs exactly the planted shared runs") {
    // docs 1 and 2 share a 10-word run: the 3 interior 8-grams are
    // duplicated and together cover all 10 run words; every 8-gram
    // touching private vocabulary is unique. The scrub must remove
    // the run from BOTH docs and nothing else.
    val run = (1 to 10).map(t => s"dupw$t").mkString(" ")
    val priv1a = doc(20, 1); val priv1b = doc(20, 11)
    val priv2a = doc(20, 2); val priv2b = doc(20, 12)
    val docs = Seq(
      (1L, priv1a + " " + run + " " + priv1b),
      (2L, priv2a + " " + run + " " + priv2b),
      (3L, doc(40, 3)),
      (4L, doc(5, 4))
    ).toDF("doc_id", "text")
    val rows = Dedup.dupSpanRemove(docs, "doc_id", "text", spanLen = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows(1L) == ((priv1a + " " + priv1b, 50L, 40L)))
    assert(rows(2L) == ((priv2a + " " + priv2b, 50L, 40L)))
    // unique doc passes through verbatim
    assert(rows(3L) == ((doc(40, 3), 40L, 40L)))
    // too short for any span -> untouched
    assert(rows(4L) == ((doc(5, 4), 5L, 5L)))
  }

  test("dupSpanRemove scrubs within-document repetition") {
    val run = (1 to 8).map(t => s"repw$t").mkString(" ")
    val mid = doc(10, 5)
    // the same 8-gram opens and closes ONE doc (boilerplate loop):
    // both copies must go, the middle must survive
    val docs = Seq(
      (1L, run + " " + mid + " " + run),
      (2L, doc(30, 6))
    ).toDF("doc_id", "text")
    val r1 = Dedup.dupSpanRemove(docs, "doc_id", "text", spanLen = 8)
      .filter(col("doc_id") === 1L).head()
    assert(r1.getString(1) == mid)
    assert(r1.getLong(2) == 26L && r1.getLong(3) == 10L)
  }

  /** Test-side replica of Packing.hash48 (md5 hex prefix as long). */
  private def hash48(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }

  test("tokenBudgetMix realizes exact per-row epoch counts") {
    // source A: 4 docs x 25 tokens = 100 total, budget 250 -> ppm
    // 2_500_000: every row twice plus a hash-decided third copy.
    // source B: total 100, budget 50 -> 0 or 1 copies. source C has
    // no budget -> dropped entirely.
    val df = Seq(
      (1L, "A", 25L), (2L, "A", 25L), (3L, "A", 25L), (4L, "A", 25L),
      (5L, "B", 25L), (6L, "B", 25L), (7L, "B", 25L), (8L, "B", 25L),
      (9L, "C", 25L)
    ).toDF("doc_id", "source", "tok")
    val out = Sampling.tokenBudgetMix(df, "doc_id", "source", "tok",
        Map("A" -> 250L, "B" -> 50L))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n"),
        sort_array(collect_list(col("epoch"))).as("epochs"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    (1L to 4L).foreach { id =>
      val expected = 2L + (if (hash48(id.toString) % 1000000 < 500000) 1L else 0L)
      assert(out(id)._1 == expected, s"doc $id copies")
      assert(out(id)._2 == (0L until expected), s"doc $id epoch indices")
    }
    (5L to 8L).foreach { id =>
      val expected = if (hash48(id.toString) % 1000000 < 500000) 1L else 0L
      assert(out.get(id).map(_._1).getOrElse(0L) == expected, s"doc $id copies")
    }
    assert(!out.contains(9L), "unbudgeted source must drop")
    // realized totals concentrate around the budgets
    val kept = Sampling.tokenBudgetMix(df, "doc_id", "source", "tok",
      Map("A" -> 250L, "B" -> 50L))
    val aTok = kept.filter(col("source") === "A")
      .agg(sum(col("tok"))).head().getLong(0)
    assert(aTok >= 200L && aTok <= 300L)
  }

  test("perceptron: epoch-1 weights are the per-bucket label sums") {
    // zero init misclassifies everything (y*0 <= 0), so the first
    // update must equal sum(label) per word-occurrence bucket —
    // recomputed here independently of the operator
    val B = 64
    val toks = Seq((1, "aa bb aa"), (-1, "bb cc"))
      .toDF("y", "text")
      .select(col("y"),
        graft.functions.TextFunctions.words(col("text")).as("w"))
    val got = Quality.perceptronStep(toks, "w", "y", Vector.fill(B)(0L))
    val expect = Array.fill(B)(0L)
    for ((wd, y) <- Seq(("aa", 1L), ("bb", 1L), ("aa", 1L),
                        ("bb", -1L), ("cc", -1L)))
      expect((hash48(wd) % B).toInt) += y
    assert(got == expect.toVector)
  }

  test("gopher rules: each planted violation trips exactly its rule") {
    import graft.operators.GopherRules
    val good = ("the cat sat of the mat and then ran to the barn " * 5).trim
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "the of short"),                        // word count < minWords
      (3L, ("the of " + "extraordinarily " * 48).trim), // mean len > 10
      (4L, ("cat mat sat ran barn " * 10).trim),   // no stopwords
      (5L, good + " " + ("#tag " * 20).trim)       // symbol ratio > 10%
    ).toDF("doc_id", "text")
    val r = GopherRules(docs, "doc_id", "text", minWords = 10)
      .collect().map(x => x.getLong(0) -> x.getInt(6)).toMap
    assert(r == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0))
  }

  test("keepBestPerComponent keeps the highest-score copy per cluster") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 5L))
      .toDF("doc_id", "n_words")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestPerComponent(pairs, docs, "doc_id", "n_words")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // cluster {1,2,3} labeled by min id 1 keeps doc 2 (score 30);
    // singleton 4 survives as its own component
    assert(out == Set((2L, 1L, 30L), (4L, 4L, 5L)))
  }

  test("bm25 ranks by term frequency and drops term-free documents") {
    import graft.operators.Retrieval
    val filler = doc(40, 9)
    val docs = Seq(
      (1L, s"$filler spark spark spark join"),
      (2L, s"$filler spark"),
      (3L, filler)
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, "doc_id", "text",
      Seq("spark", "join"), topK = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "doc 1 (3x spark + join) outranks doc 2 (1x spark); doc 3 absent")
    assert(out.head.getLong(1) == 2L, "doc 1 matches both terms")
  }

  test("bm25Batch scores each query exactly as the single-query form") {
    import graft.operators.Retrieval
    val filler = doc(40, 9)
    val docs = Seq(
      (1L, s"$filler spark spark spark join"),
      (2L, s"$filler spark fast"),
      (3L, s"$filler fast fast")
    ).toDF("doc_id", "text")
    val q = Seq((7L, "spark"), (7L, "join"), (8L, "fast"))
      .toDF("qid", "term")
    val batch = Retrieval.bm25Batch(docs, "doc_id", "text",
      q, "qid", "term", topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (qid <- Seq(7L, 8L)) {
      val terms = if (qid == 7L) Seq("spark", "join") else Seq("fast")
      val single = Retrieval.bm25(docs, "doc_id", "text", terms,
        topK = 10).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(single.nonEmpty &&
        single == batch.collect { case ((`qid`, d), s) => d -> s })
    }
  }

  test("mmr trades the redundant second hit for the diverse one") {
    import graft.operators.Similarity
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // unit vectors: 1 is the best hit; 2 is its near-duplicate
    // (sim(1,2) ~ 0.9998) with relevance 0.89; 3 sits on the other
    // side of the query (sim(1,3) ~ 0.54) with relevance 0.85, so
    // 0.7*0.89 - 0.3*0.9998 = 0.32 loses to 0.7*0.85 - 0.3*0.54 = 0.43
    val emb = Seq(
      (0L, v(1, 0, 0)),            // query
      (1L, v(0.9, 0.4359, 0)),     // best hit
      (2L, v(0.89, 0.456, 0)),     // near-duplicate of 1
      (3L, v(0.85, -0.5268, 0))    // diverse, slightly less relevant
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(
      emb.filter(col("vec_id") === 0), emb,
      "vec_id", "vec_id", "embedding", shortlist = 3, k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    // plain top-2 is (1, 2); MMR's second pick pays the 0.3-weighted
    // redundancy penalty and takes 3 instead
    assert(out == Seq(1L, 3L))
  }

  test("heavy hitters: exact hot terms survive sketch eviction") {
    import graft.functions.HeavyHitters
    // two hot terms (30% / 20% of tokens) amid 200 singleton tail
    // terms; k=8 counters force constant MG eviction, yet the exact
    // second pass must return exactly the terms with cnt*8 > n
    val body = (List.fill(60)("hot1") ++ List.fill(40)("hot2") ++
      (1 to 100).map(i => s"tail$i")).mkString(" ")
    val docs = Seq((1L, body), (2L, body.replace("tail", "cold")))
      .toDF("doc_id", "text")
    val out = HeavyHitters.frequentTerms(docs, "text", k = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("hot1" -> 120L, "hot2" -> 80L))
  }

  test("quality filter: planted separable vocabularies classify perfectly") {
    val pos = (1L to 20L).map(i =>
      (i, 1, (1 to 30).map(t => s"pos${(i + t) % 17}").mkString(" ")))
    val neg = (21L to 40L).map(i =>
      (i, -1, (1 to 30).map(t => s"neg${(i + t) % 17}").mkString(" ")))
    val docs = (pos ++ neg).toDF("doc_id", "y", "text")
    val w = Quality.trainPerceptron(docs, "text", "y",
      buckets = 4096, epochs = 2)
    val out = Quality.scoreLinear(docs, "doc_id", "text", w).collect()
    assert(out.length == 40)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(3) == (if (id <= 20L) 1 else 0),
        s"doc $id score ${r.getLong(2)}")
    }
  }

  test("bigramNll: reference-like text scores far below junk, costs exact") {
    // reference = repetitions of one sentence; doc 1 repeats it
    // (every bigram seen), doc 2 is all-unknown words, doc 3 uses
    // seen words in unseen order (unigram backoff)
    val sent = "the quick fox jumps over the lazy dog"
    val ref = (1L to 5L).map(i => (i, sent)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, sent + " " + sent),
      (2L, "zzz yyy xxx www vvv uuu"),
      (3L, "dog the over fox quick jumps the lazy")
    ).toDF("doc_id", "text")
    val byId = graft.operators.LanguageModel
      .bigramNll(docs, "doc_id", "text", ref, "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(3)))).toMap
    // doc 1: 15 scored positions; 'dog the' (the seam) is the only
    // unseen bigram; 'the quick'/'the lazy' split c('the')=10 -> all
    // in-model costs are small; doc 2: every token unknown ->
    // cost = -ln(0.4/(total*10)) = -ln(0.4/400) each
    assert(byId(1L)._1 == 15L && byId(2L)._1 == 5L && byId(3L)._1 == 7L)
    val unkCost = math.floor(1e6 * -math.log(0.4 / (40.0 * 10.0))).toLong
    assert(byId(2L)._2 == unkCost) // every position identical -> avg exact
    assert(byId(1L)._2 < byId(3L)._2 && byId(3L)._2 < byId(2L)._2)
  }

  test("bigramNll join form == broadcast-model narrow form on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.filter(col("doc_id") % 5 === 0)
    val joinForm = graft.operators.LanguageModel
      .bigramNll(docs, "doc_id", "text", ref, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val model = graft.operators.LanguageModel.trainNgrams(ref, "text", order = 2)
    val narrowForm = graft.operators.LanguageModel
      .ngramNllNarrow(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(joinForm == narrowForm && joinForm.nonEmpty)
  }

  test("rrfFuse: exact integer contributions, cross-list sum, id tiebreak") {
    // list A ranks docs 1,2,3; list B ranks 3,2,4. k=60.
    // doc 3: 1000000/63 + 1000000/61 = 15873 + 16393 = 32266
    // doc 2: 1000000/62 + 1000000/62 = 16129 + 16129 = 32258
    // doc 1: 1000000/61 = 16393 ; doc 4: 1000000/63 = 15873
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((3L, 1L), (2L, 2L), (4L, 3L)).toDF("doc_id", "rank")
    val out = graft.operators.Retrieval
      .rrfFuse(Seq(a, b), "doc_id", "rank", kRrf = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (3L, 2L, 32266L), (2L, 2L, 32258L), (1L, 1L, 16393L),
      (4L, 1L, 15873L)))
  }
}
