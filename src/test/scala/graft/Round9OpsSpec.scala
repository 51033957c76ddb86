package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.plans.VectorExpressions

/** Round-9 hardening: the RobustStats scale guard, structural plane
  * equality for the sign-signature kernel, null-safe drift keys,
  * strict half-open interval semantics, and the two untested
  * arithmetic regimes flagged by review (scaledDivTrunc past 2^63
  * numerators, recallAtK short-exact frames).
  */
class Round9OpsSpec extends SparkSpec {

  test("RobustStats.stats fails fast past maxRowsPerGroup, naming the sketch path") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 5L))
      .toDF("k", "v")
    // normal path unchanged under the default cap
    assert(RobustStats.stats(df, "k", "v").count() == 2)
    val err = intercept[IllegalArgumentException] {
      RobustStats.stats(df, "k", "v", maxRowsPerGroup = 2L)
    }
    assert(err.getMessage.contains("q_approx_quantile"),
      s"guard must name the approximate scale path: ${err.getMessage}")
    assert(err.getMessage.contains("3 rows"),
      s"guard must report the offending group size: ${err.getMessage}")
  }

  test("SignSignature: independently built identical planes compare sameResult") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(3L, -4L))).toDF("v")
    // two DISTINCT array instances with equal contents — under the
    // old Array field these compared by reference and every
    // canonical-plan equality (CacheManager, PersistSlots sharing,
    // ReuseExchange) failed for plans containing the kernel
    def planes() = Array(Array(1L, 2L), Array(-3L, 4L))
    val d1 = df.select(VectorExpressions.signSignature(col("v"), planes()).as("s"))
    val d2 = df.select(VectorExpressions.signSignature(col("v"), planes()).as("s"))
    assert(d1.queryExecution.analyzed.sameResult(d2.queryExecution.analyzed),
      "equal plane matrices must canonicalize equal")
    // different planes must still NOT compare equal
    val d3 = df.select(VectorExpressions.signSignature(col("v"),
      Array(Array(9L, 9L), Array(-3L, 4L))).as("s"))
    assert(!d1.queryExecution.analyzed.sameResult(d3.queryExecution.analyzed))
    // and the arithmetic is unchanged: (3,-4)·(1,2)=-5 -> bit0=0;
    // (3,-4)·(-3,4)=-25 -> bit1=0
    assert(d1.head().getLong(0) == 0L)
  }

  test("intervalOverlap: empty half-open intervals match nothing") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // left [5,5) is EMPTY; right [1,10) strictly contains its point —
    // the s1<e2 AND s2<e1 predicate alone would admit the pair
    val a = Seq((1L, ts(5), ts(5)), (2L, ts(3), ts(6))).toDF("ida", "sa", "ea")
    val b = Seq((7L, ts(1), ts(10))).toDF("idb", "sb", "eb")
    val got = RangeJoin.intervalOverlap(a, b, "sa", "ea", "sb", "eb")
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((2L, 7L)),
      s"only the non-degenerate interval may match, got ${got.toSeq}")
  }

  test("psiByGroup: a NULL group aligns as one cohort, not disjoint half-rows") {
    import spark.implicits._
    val ref = Seq((Option.empty[String], 10.0), (None, 30.0),
      (Some("a"), 10.0)).toDF("src", "v")
    val cur = Seq((Option.empty[String], 10.0), (None, 60.0),
      (Some("a"), 10.0)).toDF("src", "v")
    val out = Drift.psiByGroup(ref, cur, "src", "v", bucketWidth = 25.0)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(out.size == 2, s"null group + 'a' = two rows, got $out")
    // null-group buckets: ref {0,1}, cur {0,2} -> union 3 occupied
    // buckets. The null-unsafe join produced 4 (each side's rows
    // entering separately), inflating n_buckets and the smoothing b.
    assert(out(None) == 3L, s"null group must align to 3 buckets, got $out")
    assert(out(Some("a")) == 1L)
  }

  test("recallAtK: fewer exact neighbors than k, and duplicate approx rows") {
    import spark.implicits._
    // query 1 has only 2 exact neighbors; a perfect retrieval at k=5
    // must score e4 10000 (least(k, n_exact) denominator), and the
    // duplicated approx row must not double-count a hit
    val exact = Seq((1L, 10L), (1L, 20L)).toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 10L), (1L, 20L), (1L, 99L))
      .toDF("query_id", "neighbor_id")
    val r = Similarity.recallAtK(exact, approx, k = 5).head()
    assert(r.getLong(1) == 2L, s"hits must be 2, got ${r.getLong(1)}")
    assert(r.getLong(2) == 10000L,
      s"full retrieval of a short exact frame must be e4 10000, got ${r.getLong(2)}")
  }

  test("semanticOverlapReport flags embedding-space leakage, nulls for clean rows") {
    import spark.implicits._
    // train 1 = eval vector exactly (cos 1.0), train 2 orthogonal
    val eval = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Decontaminate.semanticOverlapReport(
        train, eval, "vec_id", "embedding", minCosine = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out(1L) == ((1L, Some(1.0))), s"exact copy must flag: $out")
    assert(out(2L) == ((0L, None)), s"orthogonal vector must be clean: $out")
  }

  test("text_novelty: all-unique doc scores e4 10000, fully-shared doc 0") {
    import org.apache.spark.sql.functions.col
    val out = graft.queries.TextQueries.queries("text_novelty")(
      spark, "/root/testdata/sf0.001").cache()
    // bounds + arithmetic: novelty_e4 = n_unique*10000 div n_grams
    val bad = out.filter(col("novelty_e4") =!=
      graft.operators.IntMath.scaledDivTrunc(
        col("n_unique"), 10000L, col("n_grams"))).count()
    assert(bad == 0)
    assert(out.filter(col("novelty_e4") < 0 ||
      col("novelty_e4") > 10000).count() == 0)
    assert(out.count() > 0)
    out.unpersist()
  }

  test("IntMath: seeded random property vs BigInteger, signed and near-overflow") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(20260814L)
    // mix magnitudes: small, 2^53 boundary, and near-Long.Max halves
    def draw(): Long = rng.nextInt(3) match {
      case 0 => rng.nextLong() % 1000000L
      case 1 => (1L << 53) + rng.nextLong() % (1L << 20)
      case 2 => rng.nextLong() / 2
    }
    val cases = Seq.fill(200) {
      val n = { var v = draw(); while (v == 0) v = draw(); v }
      (draw(), n)
    }
    // idivTrunc: dividend must be exactly divisible? No — it truncates
    // via (a - a%n); BigInteger reference: a/n truncates toward zero
    val gotDiv = cases.toDF("a", "n")
      .select(graft.operators.IntMath.idivTrunc(col("a"), col("n")))
      .collect().map(_.getLong(0)).toSeq
    val wantDiv = cases.map { case (a, n) =>
      java.math.BigInteger.valueOf(a)
        .divide(java.math.BigInteger.valueOf(n)).longValueExact()
    }
    assert(gotDiv == wantDiv)
    // scaledDivTrunc on ratio-shaped inputs (|x| <= |n| so the
    // quotient fits): numerators pass 2^63 whenever |x| > ~9.2e14
    val ratioCases = cases.map { case (a, n) =>
      val hi = math.max(math.abs(a), math.abs(n))
      val lo = math.min(math.abs(a), math.abs(n))
      (lo, math.max(1L, hi))
    }
    val gotS = ratioCases.toDF("x", "n")
      .select(graft.operators.IntMath.scaledDivTrunc(col("x"), 10000L, col("n")))
      .collect().map(_.getLong(0)).toSeq
    val wantS = ratioCases.map { case (x, n) =>
      java.math.BigInteger.valueOf(x)
        .multiply(java.math.BigInteger.valueOf(10000L))
        .divide(java.math.BigInteger.valueOf(n)).longValueExact()
    }
    assert(gotS == wantS)
  }

  test("fourgram LM: every backoff level scores, pruning cascades one level up") {
    import spark.implicits._
    import graft.operators.LanguageModel
    val ref = Seq("a b c d a b c d", "x y").toDF("text")
    val m = LanguageModel.trainNgrams(ref, "text", order = 4)
    // lower-order consistency: every surviving 4-gram's context
    // trigram survives
    m.tables(3).keys.foreach { k =>
      assert(m.tables(2).contains(k.substring(0, k.lastIndexOf(' '))),
        s"4-gram '$k' lacks its context trigram")
    }
    assert(m.total == 10L)
    // docs hitting each ladder branch: seen 4-gram; trigram backoff
    // ("b c d" seen, "? b c d" unseen... use novel context); unigram
    // backoff (known word, unseen grams); unknown word
    val docs = Seq(
      (1L, "a b c d"),   // position 4: 4-gram "a b c d" seen (c=2? appears twice in ref doc 1... "a b c d a b c d" contains "a b c d" at 1 and 5, plus "d a b c"/"c d a b" etc.)
      (2L, "q b c d"),   // 4-gram unseen, trigram "b c d" seen
      (3L, "q q q a"),   // only unigram "a" known at the last position
      (4L, "q q q q")    // unknown everywhere
    ).toDF("doc_id", "text")
    val out = LanguageModel.ngramNllNarrow(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // exact expectations from the scorer's own formulas
    def cost(r: Double) = math.floor(1000000.0 * -math.log(r)).toLong
    assert(out(1L) == cost(m.tables(3)("a b c d").toDouble / m.tables(2)("a b c").toDouble))
    assert(out(2L) == cost(0.4 * (m.tables(2)("b c d").toDouble / m.tables(1)("b c").toDouble)))
    assert(out(3L) == cost(0.064 * (m.tables(0)("a").toDouble / 10.0)))
    assert(out(4L) == cost(0.064 / (10.0 * 10.0)))
    // under-4-word docs drop out
    assert(LanguageModel.ngramNllNarrow(
      Seq((9L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", m)
      .count() == 0)
  }

  test("charEntropyE4 UDF equals the HOF formula on multibyte/unicode text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // fixture corpora are ASCII, so the oracle gate can't pin the
    // unicode path: accents, CJK, an astral-plane emoji (surrogate
    // pair — code-point counting, not UTF-16 units), and mixed input
    val texts = Seq("héllo wörld", "日本語のテキストです", "aé中😀x",
      "aaaa", "ab", "", "mixed ascii und ümlaute... 12345")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = graft.functions.TextFunctions.charEntropyE4(col("t"))
    // the pre-UDF HOF formula, inlined: sorted distinct chars x
    // filter-count, left-fold c*ln(c), floor((ln(n)*n - s)*1e4/n)
    val cs = transform(sequence(lit(1), length(col("t"))),
      i => col("t").substr(i, lit(1)))
    val d = array_sort(array_distinct(cs))
    val counts = transform(d, c => size(filter(cs, x => x === c)).cast("double"))
    val terms = transform(counts, c => c * log(c))
    val n = length(col("t")).cast("double")
    val s = aggregate(terms, lit(0.0), (acc, t) => acc + t)
    val want = when(length(col("t")) >= 1,
      floor((log(n) * n - s) * lit(10000.0) / n).cast("long")).otherwise(lit(0L))
    val rows = df.select(col("id"), got.as("g"), want.as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (i, g, w) =>
      assert(g == w, s"entropy mismatch on '${texts(i.toInt)}': udf=$g hof=$w")
    }
    // distinct-count parity on the same inputs
    val dGot = df.select(graft.functions.TextFunctions.charDistinct(col("t")))
      .collect().map(_.getLong(0)).toSeq
    val dWant = df.select(when(length(col("t")) >= 1,
      size(array_distinct(cs)).cast("long")).otherwise(lit(0L)))
      .collect().map(_.getLong(0)).toSeq
    assert(dGot == dWant)
  }

  test("stream_dedup_ingest drives the real micro-batch path and equals the batch join") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.StreamQueries.queries("stream_dedup_ingest")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // batch twin: same band-key probe without the streaming machinery
    val docs = graft.queries.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val index = Dedup.corpusBandIndex(
      docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", 12, 4)
    val want = Dedup.bandKeysNarrow(
        docs.filter(col("doc_id") % 10 === 7), "doc_id", "text", 12, 4)
      .join(index, Seq("band_key"))
      .select(col("doc_id"), col("corpus_id"), col("band_key"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want, s"stream result must equal the batch probe")
    assert(got.nonEmpty, "fixture must produce at least one band hit")
  }

  test("scaledDivTrunc: exact in the >2^63-numerator regime the long path wraps in") {
    import spark.implicits._
    // x * 10000 wraps a long once x > ~9.2e14; at x = Long.MaxValue/2
    // the old long-multiply path produced garbage. The decimal-widened
    // path must return the exact truncated quotient (the contract is
    // RATIO-like calls — quotient fits a long — so n ~ x here, the
    // hits/total shape recallAtK and the winsorized mean feed it).
    val x = Long.MaxValue / 2 // 4611686018427387903
    val n = x + 13L
    val expected = (BigInt(x) * 10000 / n).toLong // truncation: operands positive
    val got = Seq((x, n)).toDF("x", "n")
      .select(IntMath.scaledDivTrunc(col("x"), 10000L, col("n")).as("q"))
      .head().getLong(0)
    assert(got == expected, s"expected $expected, got $got")
    // document the wrap the old path had: the long product is negative
    assert(x * 10000L < 0, "precondition: long multiply wraps on this input")
  }
}
