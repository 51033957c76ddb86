package graft

import org.apache.spark.sql.functions._

/** Round-11 operators: the min-K% prob membership signal over the
  * order-N LM, and the contamination span scrub.
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

  test("scrubOverlaps removes exactly the leaked spans and keeps " +
    "clean prose, clean docs pass through verbatim") {
    import graft.operators.Decontaminate
    val leak = (1 to 8).map(i => s"leak$i").mkString(" ")
    val eval = Seq((100L, s"header $leak footer")).toDF("doc_id", "text")
    val train = Seq(
      // leak embedded mid-document: the 8 leaked words go, prose stays
      (1L, s"alpha beta $leak gamma delta"),
      // no overlap: verbatim pass-through (lower-cased tokenization)
      (2L, "Alpha Beta Gamma Delta Epsilon"),
      // two copies of the leak: both spans scrubbed
      (3L, s"$leak x $leak")).toDF("doc_id", "text")
    val out = Decontaminate.scrubOverlaps(train, eval, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("alpha beta gamma delta", 12L, 4L)))
    assert(out(2L) == (("alpha beta gamma delta epsilon", 5L, 5L)))
    assert(out(3L) == (("x", 17L, 1L)))
  }

  test("funnel chases steps strictly in order with (ts, id) tiebreaks; " +
    "early later-steps do not complete the funnel") {
    import graft.operators.Funnel
    val ev = Seq(
      // user 1 completes the funnel in order
      (1L, 10L, 100L, "signup"), (1L, 20L, 101L, "view"),
      (1L, 30L, 102L, "click"), (1L, 40L, 103L, "purchase"),
      // user 2 stalls after view (the click precedes the signup)
      (2L, 5L, 200L, "click"), (2L, 10L, 201L, "signup"),
      (2L, 20L, 202L, "view"),
      // user 3: purchase BEFORE the click — depth 3, t_purchase null
      (3L, 10L, 300L, "signup"), (3L, 20L, 301L, "view"),
      (3L, 25L, 302L, "purchase"), (3L, 30L, 303L, "click"),
      // user 4: same-ts tiebreak — view eid 401 > signup eid 400
      // counts; the eid-399 view at the same ts must not
      (4L, 10L, 399L, "view"), (4L, 10L, 400L, "signup"),
      (4L, 10L, 401L, "view"))
      .toDF("user_id", "us", "event_id", "event_type")
    val out = Funnel.funnel(ev, "user_id", "us", "event_id", "event_type",
        Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), r.getInt(5)))).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), Some(40L), 4)))
    assert(out(2L) == ((Some(10L), Some(20L), None, None, 2)))
    assert(out(3L) == ((Some(10L), Some(20L), Some(30L), None, 3)))
    assert(out(4L) == ((Some(10L), Some(10L), None, None, 2)))
  }

  test("retention counts each cohort's users active at each offset; " +
    "offset 0 equals cohort size") {
    import graft.operators.Funnel
    // periods (periodLen = 10): u1 first at 0, active 0/1/3;
    // u2 first at 0, active 0/1; u3 first at 1, active 1/3
    val ev = Seq(
      (1L, 5L), (1L, 12L), (1L, 14L), (1L, 33L),
      (2L, 1L), (2L, 19L),
      (3L, 10L), (3L, 31L))
      .toDF("user_id", "us")
    val out = Funnel.retention(ev, "user_id", "us", periodLen = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 2L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("videoFingerprint64: a one-frame repaint flips at most two " +
    "gradient bits; short/undecodable videos fall out as null") {
    import graft.operators.Multimodal
    def gif(levels: Seq[Int]): Array[Byte] =
      Multimodal.encodeGifFrames(4, 4, levels.map(l => (l, l, l)))
    val base = (0 until 66).map(f => (f * 37 + 11) % 256)
    val edited = base.updated(9, (base(9) + 128) % 256)
    val rows = Seq(
      (1L, gif(base)), (2L, gif(edited)),
      (3L, gif(base.take(10))),                  // too short -> null fp
      (4L, Array[Byte](1, 2, 3)))                // undecodable -> null fp
      .toDF("doc_id", "payload")
    val fps = Multimodal.videoFingerprint64(rows, "payload")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(fps(3L).isEmpty && fps(4L).isEmpty)
    assert(fps(1L).isDefined && fps(2L).isDefined)
    val ham = java.lang.Long.bitCount(fps(1L).get ^ fps(2L).get)
    assert(ham >= 1 && ham <= 2, s"hamming=$ham")
    val pairs = graft.operators.Binary.hammingNearDupPairs(
        Multimodal.videoFingerprint64(rows, "payload"),
        "doc_id", "fp", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("topPaths counts consecutive type windows in (ts, id) order " +
    "with deterministic rank tiebreaks") {
    import graft.operators.Funnel
    val ev = Seq(
      // u1 journey: a b a b  -> paths a>b>a, b>a>b
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 30L, 3L, "a"), (1L, 40L, 4L, "b"),
      // u2 journey with a ts tie broken by id: a (b, id 6) (c, id 7)
      // -> a>b>c (not a>c>b)
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"), (2L, 20L, 7L, "c"),
      // u3 too short for any 3-window
      (3L, 10L, 8L, "a"), (3L, 20L, 9L, "b"))
      .toDF("user_id", "us", "event_id", "event_type")
    val out = Funnel.topPaths(ev, "user_id", "us", "event_id",
        "event_type", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    assert(out.toSeq == Seq(
      ("a>b>a", 1L, 1L), ("a>b>c", 1L, 2L), ("b>a>b", 1L, 3L)))
  }

  test("PROPERTY: funnel equals the brute-force sequential chase on " +
    "seeded random event logs") {
    import graft.operators.Funnel
    val rng = new scala.util.Random(4177)
    val types = Seq("a", "b", "c")
    (1 to 6).foreach { _ =>
      val ev = (0 until 120).map { i =>
        (rng.nextInt(8).toLong, rng.nextInt(10).toLong, i.toLong,
          types(rng.nextInt(types.size)))
      }
      val expect = ev.groupBy(_._1).map { case (u, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        // sentinel predecessor: the first step needs no strict-after
        var prev: Option[(Long, Long)] = Some((Long.MinValue, Long.MinValue))
        val ts = types.map { t =>
          val hit = prev.flatMap { case (pts, pid) =>
            sorted.find(r => r._4 == t &&
              (r._2 > pts || (r._2 == pts && r._3 > pid)))
          }
          prev = hit.map(r => (r._2, r._3))
          hit.map(_._2)
        }
        u -> ((ts, ts.count(_.isDefined)))
      }
      val got = Funnel.funnel(ev.toDF("user_id", "us", "event_id",
          "event_type"), "user_id", "us", "event_id", "event_type", types)
        .collect().map(r => r.getLong(0) ->
          ((Seq(Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
             .map(_.map(_.asInstanceOf[Long])), r.getInt(4)))).toMap
      assert(got == expect)
    }
  }

  test("PROPERTY: scrubOverlaps equals the brute-force span-removal " +
    "reference on seeded random corpora") {
    import graft.operators.Decontaminate
    val rng = new scala.util.Random(1711)
    val vocab = (0 until 10).map(i => s"w$i")
    def randDoc(): String =
      Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val n = 3
    (1 to 8).foreach { _ =>
      val docs = (0L until 24L).map(i => (i, randDoc()))
      val (evalD, trainD) = docs.partition(_._1 % 7 == 0)
      // the library's tokenization (words() and its DuckDB oracle
      // twin) maps EMPTY text to [""] — one empty token — so the
      // reference must too: split with -1 keeps the trailing empty
      def tok(t: String): Seq[String] =
        t.trim.toLowerCase.split("\\s+", -1).toSeq
      def grams(t: String): Seq[Seq[String]] = {
        val w = tok(t)
        if (w.size < n) Seq.empty else w.sliding(n).toSeq
      }
      val evalGrams = evalD.flatMap(d => grams(d._2)).toSet
      val expect = trainD.map { case (id, t) =>
        val w = tok(t)
        val starts = if (w.size < n) Seq.empty
          else (0 to w.size - n).filter(p => evalGrams.contains(w.slice(p, p + n)))
        val covered = starts.flatMap(p => p until p + n).toSet
        val kept = w.zipWithIndex.collect { case (wd, i) if !covered(i) => wd }
        id -> ((kept.mkString(" "), w.size.toLong, kept.size.toLong))
      }.toMap
      val got = Decontaminate.scrubOverlaps(
          trainD.toDF("doc_id", "text"), evalD.toDF("doc_id", "text"),
          "doc_id", "text", n)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == expect)
    }
  }

  test("PROPERTY: blocklistAnnotate equals the brute-force token-count " +
    "reference on seeded random corpora") {
    import graft.operators.Quality
    val rng = new scala.util.Random(2311)
    val vocab = (0 until 12).map(i => s"t$i")
    (1 to 8).foreach { _ =>
      val list = rng.shuffle(vocab).take(1 + rng.nextInt(4))
      val budget = rng.nextInt(3).toLong
      val docs = (0L until 30L).map(i => (i,
        Seq.fill(1 + rng.nextInt(15))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
      val expect = docs.map { case (id, t) =>
        val w = t.split("\\s+").toSeq
        val hits = w.count(list.contains)
        id -> ((w.size.toLong, hits.toLong, if (hits <= budget) 1 else 0))
      }.toMap
      val got = Quality.blocklistAnnotate(
          docs.toDF("doc_id", "text"), "doc_id", "text", list, budget)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
      assert(got == expect)
    }
  }

  test("PROPERTY: protoPrune drop counts, rank permutations, and " +
    "(dist, id) rank order hold on seeded random corpora") {
    import graft.operators.KMeans
    val rng = new scala.util.Random(3137)
    (1 to 4).foreach { round =>
      val dropPct = Seq(0, 10, 25, 50, 100)(round % 5)
      val rows = (0L until 40L).map(i =>
        (i, Seq.fill(4)(rng.nextFloat() * 2 - 1)))
      val out = KMeans.protoPrune(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", k = 5, steps = 2, dropPct = dropPct)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getInt(4)))
      out.groupBy(_._2).foreach { case (_, cl) =>
        val nC = cl.length
        val dropN = nC.toLong * dropPct / 100
        assert(cl.count(_._5 == 0) == dropN)
        assert(cl.map(_._4).sorted.toSeq == (1L to nC).toSeq)
        val byRank = cl.sortBy(_._4).map(t => (t._3, t._1)).toSeq
        assert(byRank == byRank.sorted)
        cl.foreach(t => assert((t._5 == 0) == (t._4 <= dropN)))
      }
    }
  }

  test("blocklistAnnotate counts exact-token hits and applies the " +
    "hit budget; maxHits=0 is C4's drop-on-any") {
    import graft.operators.Quality
    val docs = Seq(
      (1L, "clean prose only here"),
      (2L, "one bad word: crash"),              // 1 hit
      (3L, "crash Crash CRASH and slow too"),   // 4 hits (lowercased)
      (4L, "crashing slowly"))                  // substrings do NOT match
      .toDF("doc_id", "text")
    val list = Seq("slow", "bug", "crash")
    val budget = Quality.blocklistAnnotate(docs, "doc_id", "text", list,
      maxHits = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(budget(1L) == ((0L, 1)))
    assert(budget(2L) == ((1L, 1)))
    assert(budget(3L) == ((4L, 0)))
    assert(budget(4L) == ((0L, 1)))
    val any = Quality.blocklistAnnotate(docs, "doc_id", "text", list)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(any == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 1))
  }

  test("protoPrune drops exactly the per-cluster prototypical core " +
    "and ranks by exact centroid distance") {
    import graft.operators.KMeans
    // two planted clusters of 4; coordinates exactly representable in
    // float so milliunit quantization is clean. Init centroids = the
    // two smallest ids (1 in cluster A, 2 in cluster B).
    val rows = Seq(
      (1L, Seq(0.0f, 0.0f)), (3L, Seq(0.25f, 0.0f)),
      (4L, Seq(0.0f, 0.5f)), (5L, Seq(0.75f, 0.75f)),
      (2L, Seq(8.0f, 8.0f)), (6L, Seq(8.25f, 8.0f)),
      (7L, Seq(8.0f, 8.5f)), (8L, Seq(8.75f, 8.75f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.protoPrune(rows, "vec_id", "embedding",
      k = 2, steps = 2, dropPct = 25)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(3), r.getInt(4)))).toMap
    // centroid A = (250, 312): dists 159844/97344/97844/441844 for
    // ids 1/3/4/5 -> rank order 3,4,1,5; drop count = 4*25/100 = 1
    assert(out(3L) == ((0, 1L, 0)))
    assert(out(4L) == ((0, 2L, 1)))
    assert(out(1L) == ((0, 3L, 1)))
    assert(out(5L) == ((0, 4L, 1)))
    // cluster B is the same shape shifted by 8.0 -> symmetric ranks
    assert(out(6L) == ((1, 1L, 0)))
    assert(out(2L) == ((1, 3L, 1)))
    // dropPct = 0 keeps everything
    val all = KMeans.protoPrune(rows, "vec_id", "embedding",
      k = 2, steps = 2, dropPct = 0)
    assert(all.filter(col("kept") === 0).count() == 0)
  }

  test("scrubOverlaps overlapping leak spans merge: shared words " +
    "removed once, boundaries exact") {
    import graft.operators.Decontaminate
    // eval contributes two OVERLAPPING 8-grams: w1..w8 and w2..w9
    val eval = Seq((100L, (1 to 9).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "pre " + (1 to 9).map(i => s"w$i").mkString(" ") + " post"))
      .toDF("doc_id", "text")
    val out = Decontaminate.scrubOverlaps(train, eval, "doc_id", "text", n = 8)
      .collect().head
    assert(out.getString(1) == "pre post")
    assert(out.getLong(2) == 11L && out.getLong(3) == 2L)
  }
}
