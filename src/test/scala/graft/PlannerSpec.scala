package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quality, Sampling}

/** The two curation-PLANNING operators (round 13): the filter-
  * threshold retention curve and the epoch-capped token-budget
  * waterfill — hand-computed expectations on planted frames, the
  * waterfill's budget identity, and the plumb-through into
  * tokenBudgetMix (the planner's output is exactly the mixer's
  * input).
  */
class PlannerSpec extends SparkSpec {

  test("retentionCurve: descending cumulative docs/weight + e4 shares, " +
    "negative scores floor into their step bucket") {
    import spark.implicits._
    val scored = Seq(
      (1L, 10L, 5L), (2L, 10L, 5L), (3L, 7L, 2L),
      (4L, 3L, 1L), (5L, -2L, 7L)
    ).toDF("doc_id", "score", "weight")
    val got = Quality.retentionCurve(scored, "score", "weight", step = 5L)
      .orderBy(col("threshold").desc)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (10L, 2L, 10L, 4000L, 5000L),
      (5L, 3L, 12L, 6000L, 6000L),
      (0L, 4L, 13L, 8000L, 6500L),
      (-5L, 5L, 20L, 10000L, 10000L)))
  }

  test("retentionCurve: step=1 keeps exact integer thresholds") {
    import spark.implicits._
    val scored = Seq((1L, 4L, 1L), (2L, 2L, 1L), (3L, 2L, 1L))
      .toDF("doc_id", "score", "weight")
    val got = Quality.retentionCurve(scored, "score", "weight")
      .orderBy(col("threshold").desc).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((4L, 1L), (2L, 3L)))
  }

  test("budgetWaterfill: hand-computed split regime — cheap source " +
    "caps, the rest absorb the released budget") {
    import spark.implicits._
    // A: T=100 -> w=10, cap=400, r=40;  B: T=10000 -> w=100,
    // cap=40000, r=400. Budget 10000: A caps (400), B gets
    // floor(9600/100*100) = 9600; sum = budget exactly.
    val docs = Seq(("A", 100L), ("B", 10000L)).toDF("source", "n_chars")
    val got = Sampling.budgetWaterfill(docs, "source", "n_chars",
        budget = 10000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got("A") == ((100L, 400L, true, 400L, 40000L)))
    assert(got("B") == ((10000L, 40000L, false, 9600L, 9600L)))
  }

  test("budgetWaterfill: budget above the cap sum caps everyone; " +
    "zero budget allocates zero") {
    import spark.implicits._
    val docs = Seq(("A", 100L), ("B", 400L)).toDF("source", "n_chars")
    val rich = Sampling.budgetWaterfill(docs, "source", "n_chars",
        budget = 1000000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> (r.getBoolean(3), r.getLong(4)))
      .toMap
    assert(rich("A") == ((true, 200L)) && rich("B") == ((true, 800L)))
    val broke = Sampling.budgetWaterfill(docs, "source", "n_chars",
        budget = 0L, maxEpochs = 2)
      .collect().map(r => (r.getBoolean(3), r.getLong(4)))
    assert(broke.forall { case (capped, alloc) => !capped && alloc == 0L })
  }

  test("budgetWaterfill: sum(alloc) <= budget on the real corpus, " +
    "short by at most one token per uncapped source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Sampling.budgetWaterfill(docs, "source", "n_chars",
        budget = 40000L, maxEpochs = 4)
      .collect()
    val alloc = rows.map(_.getLong(4)).sum
    val uncapped = rows.count(!_.getBoolean(3))
    val capSum = rows.map(_.getLong(2)).sum
    val expectTotal = math.min(40000L, capSum)
    assert(alloc <= expectTotal)
    assert(alloc >= expectTotal - uncapped,
      s"floor loss ${expectTotal - alloc} > $uncapped uncapped sources")
    // every allocation respects its own cap
    rows.foreach(r => assert(r.getLong(4) <= r.getLong(2), r.toString))
  }

  test("waterfill output plumbs into tokenBudgetMix: an exactly-capped " +
    "source realizes its allocation to the token") {
    import spark.implicits._
    // A's cap binds at exactly 4.0 epochs -> ppm = 4,000,000 -> every
    // row emits exactly 4 copies, zero fractional remainder: realized
    // chars = alloc deterministically
    val docs = Seq((1L, "A", 60L), (2L, "A", 40L), (3L, "B", 10000L))
      .toDF("doc_id", "source", "n_chars")
    val plan = Sampling.budgetWaterfill(docs, "source", "n_chars",
        budget = 10000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val mixed = Sampling.tokenBudgetMix(docs, "doc_id", "source",
      "n_chars", plan)
    val realizedA = mixed.filter(col("source") === "A")
      .agg(sum(col("n_chars"))).collect().head.getLong(0)
    assert(plan("A") == 400L)
    assert(realizedA == 400L)
  }

  test("percentileNormalizeHist: bucket-floor approximation tracks " +
    "the exact percent-rank within one bucket's occupancy share") {
    import spark.implicits._
    // 100 uniform integer scores in one group, 10 buckets -> each
    // bucket holds 10 docs; the histogram pct is the bucket-floor
    // percentile, so |hist - exact| < one bucket's share (10/99 of
    // the range) plus the floor step
    val scored = (0 until 100).map(i => (i.toLong, "g", i.toLong))
      .toDF("doc_id", "source", "score")
    val exact = Quality.percentileNormalize(scored, "source", "score",
        "doc_id")
      .select(col("doc_id"), col("pct_e4").as("p_exact"))
    val hist = Quality.percentileNormalizeHist(scored, "source", "score",
        buckets = 10)
      .select(col("doc_id"), col("pct_e4").as("p_hist"))
    val both = exact.join(hist, "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(both.length == 100)
    // monotone nonneg error, bounded by one bucket's occupancy
    assert(both.forall { case (e, h) => h <= e })
    assert(both.forall { case (e, h) => e - h <= (10L * 10000L) / 99L })
    // bucket floors are exact: every 10th score matches exactly
    val h0 = hist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h0(0L) == 0L && h0(10L) == 1010L && h0(90L) == 9090L)
  }

  test("percentile normalization differential fuzz: 40 random frames, " +
    "both forms vs independent references") {
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    for (trial <- 1 to 40) {
      val nGroups = 1 + rnd.nextInt(4)
      val rows = (0 until nGroups).flatMap { g =>
        (0 until (1 + rnd.nextInt(30))).map { _ =>
          (rnd.nextLong(1000000), s"g$g", rnd.nextInt(12).toLong)
        }
      }.zipWithIndex.map { case ((_, g, s), i) => (i.toLong, g, s) }
      val df = rows.toDF("doc_id", "source", "score")
      val b = 2 + rnd.nextInt(15)

      // independent exact reference: per-group (score, id) sort
      val refExact = rows.groupBy(_._2).flatMap { case (_, grp) =>
        val sorted = grp.sortBy(r => (r._3, r._1))
        val n = sorted.length
        sorted.zipWithIndex.map { case (r, i) =>
          r._1 -> (if (n > 1) i.toLong * 10000L / (n - 1) else 10000L)
        }
      }.toMap
      val gotExact = graft.operators.Quality
        .percentileNormalize(df, "source", "score", "doc_id")
        .select(col("doc_id"), col("pct_e4"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotExact == refExact, s"exact form, trial $trial")

      // independent histogram reference: equal-width buckets of the
      // group span, strictly-below counts
      val refHist = rows.groupBy(_._2).flatMap { case (_, grp) =>
        val n = grp.length
        val lo = grp.map(_._3).min; val hi = grp.map(_._3).max
        def bucket(s: Long) = ((s - lo) * b / (hi - lo + 1)).toInt
        val cnt = grp.groupBy(r => bucket(r._3)).map { case (k, v) =>
          k -> v.length
        }
        grp.map { r =>
          val below = cnt.filter(_._1 < bucket(r._3)).values.sum.toLong
          r._1 -> (if (n > 1) below * 10000L / (n - 1) else 10000L)
        }
      }.toMap
      val gotHist = graft.operators.Quality
        .percentileNormalizeHist(df, "source", "score", buckets = b)
        .select(col("doc_id"), col("pct_e4"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotHist == refHist, s"hist form b=$b, trial $trial")
    }
  }

  test("percentileNormalizeHist: single-doc group pins to 10000, " +
    "constant-score group collapses to bucket 0 with pct 0") {
    import spark.implicits._
    val scored = Seq(
      (1L, "solo", 5L),
      (2L, "flat", 7L), (3L, "flat", 7L), (4L, "flat", 7L)
    ).toDF("doc_id", "source", "score")
    val got = Quality.percentileNormalizeHist(scored, "source", "score", 8)
      .select(col("doc_id"), col("pct_e4"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10000L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("calibrationCurve: adaptive bins, per-bin rate and mean exact " +
    "(hand-worked, negative margins included)") {
    import spark.implicits._
    // margins -10..9 (range 20, 4 bins of width exactly 5); labels
    // planted so the positive rate RISES with the margin — the
    // calibrated shape the diagram exists to show
    val scored = (0 until 20).map { i =>
      val margin = i - 10L
      val y = if (i % 5 < (i / 5 + 1)) 1 else -1 // 1,2,3,4 pos per bin
      (i.toLong, margin, y)
    }.toDF("doc_id", "score", "y")
    val got = Quality.calibrationCurve(scored, "score", "y", bins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    // bin k holds margins [-10+5k, -10+5k+4]; mean = -8+5k, so
    // mean_e4 = (-8+5k)*10000 with toward-zero truncation on the
    // negative bins
    assert(got == Seq(
      (0L, -10L, 5L, 1L, 2000L, -80000L),
      (1L, -5L, 5L, 2L, 4000L, -30000L),
      (2L, 0L, 5L, 3L, 6000L, 20000L),
      (3L, 5L, 5L, 4L, 8000L, 70000L)), got.toString)
  }

  test("calibrationCurve: constant-score frame lands in one bin") {
    import spark.implicits._
    val scored = Seq((1L, 7L, 1), (2L, 7L, -1)).toDF("doc_id", "score", "y")
    val got = Quality.calibrationCurve(scored, "score", "y", bins = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4))).toSeq
    assert(got == Seq((0L, 7L, 2L, 5000L)), got.toString)
  }
}
