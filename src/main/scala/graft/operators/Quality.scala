package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fastText-style
  * filtering recipe every large crawl pipeline runs (Joulin et al.
  * 2016 for the model; CCNet / GPT-3's quality filter for the use:
  * label curated sources positive, raw crawl negative, train a
  * linear model over hashed unigram buckets, keep documents the
  * model scores positive).
  *
  * Training is the BATCH perceptron in exact integer arithmetic: an
  * epoch scores every document against the current weights (a narrow
  * fold over the word array against a broadcast weight literal) and
  * adds `label * bucket-count` over the MISCLASSIFIED documents
  * (`label * score <= 0`) into a per-bucket delta. No learning rate,
  * no float dot product — so the trained weights AND the downstream
  * keep set are pure integer functions of the data that replay
  * exactly in SQL, the same engine-portability discipline as
  * [[Sampling.importanceVotesOfWords]] (which is the GENERATIVE
  * twin of this DISCRIMINATIVE selector: DSIR votes by corpus-level
  * frequency ratios, the perceptron fits per-bucket weights to
  * labels).
  *
  * Scale shape: each epoch is ONE map-combined aggregation over the
  * corpus whose output is at most `buckets` rows (the only driver
  * data — a weight table bounded by a parameter, not the data);
  * scoring computes inside the explode's input projection, so the
  * corpus never shuffles on text. `buckets` bounds driver/broadcast
  * memory (B longs), `epochs` bounds passes. At 100 TB train on a
  * labeled SAMPLE (the standard recipe — the classifier needs
  * thousands of exemplars, not the corpus) and let the narrow
  * scoring pass be the only full-corpus touch.
  */
object Quality {
  import graft.functions.TextFunctions.words

  /** Bucket of one word: the audited engine-portable 48-bit md5 mod
    * B (replay: `CAST('0x' || substring(md5(w),1,12) AS BIGINT) % B`). */
  private def bucketOf(w: Column, buckets: Int): Column =
    (Packing.hash48c(w) % buckets).cast("int")

  /** Narrow integer score: Σ_w weight[bucket(w)] — the codegen'd
    * [[graft.plans.BucketWeightSum]] kernel (optimization round 16;
    * the previous `aggregate(...)` higher-order fold was interpreted
    * and re-ran an interpreted md5 tree per word — it dominated every
    * scoring scan and both perceptron training epochs). Same values:
    * the kernel computes the identical 48-bit md5 bucket and long
    * fold, so trained weights, scores, and the SQL replay are
    * unchanged. */
  private def scoreExpr(wordsCol: Column, weights: Seq[Long]): Column =
    org.apache.spark.sql.graftglue.Bridge.column(
      graft.plans.BucketWeightSum(
        org.apache.spark.sql.graftglue.Bridge.expression(wordsCol),
        weights.toIndexedSeq))

  /** One batch perceptron epoch over a tokenized frame: returns
    * `weights + Σ_{misclassified d} label_d * counts_d` as a new
    * dense table. `labelCol` must be +1/-1. One aggregation job, at
    * most `weights.length` result rows. */
  def perceptronStep(toks: DataFrame, wordsCol: String, labelCol: String,
                     weights: Seq[Long]): Seq[Long] = {
    val deltas: Map[Int, Long] = toks
      .select(col(labelCol).cast("long").as("__y"),
        col(wordsCol).as("__w"), scoreExpr(col(wordsCol), weights).as("__s"))
      .filter(col("__y") * col("__s") <= 0)
      .select(col("__y"), explode(col("__w")).as("__wd"))
      .groupBy(bucketOf(col("__wd"), weights.length).as("__b"))
      .agg(sum(col("__y")).as("__d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    weights.zipWithIndex.map { case (w, i) => w + deltas.getOrElse(i, 0L) }
  }

  /** Train from zero weights for `epochs` passes. Tokenizes once and
    * persists the (label, words) projection across epochs — each
    * epoch scans it exactly once. */
  def trainPerceptron(docs: DataFrame, textCol: String, labelCol: String,
                      buckets: Int = 4096, epochs: Int = 2): Seq[Long] =
    trainPerceptronOfWords(
      docs.select(col(labelCol), words(col(textCol)).as("__gqw")),
      "__gqw", labelCol, buckets, epochs)

  /** [[trainPerceptron]] over an already-projected word-array column
    * — composed pipelines tokenize once. */
  def trainPerceptronOfWords(toks: DataFrame, wordsCol: String,
                             labelCol: String, buckets: Int = 4096,
                             epochs: Int = 2): Seq[Long] = {
    val t = toks.select(col(labelCol), col(wordsCol)).persist()
    try {
      var w: Seq[Long] = Vector.fill(buckets)(0L)
      for (_ <- 1 to epochs) w = perceptronStep(t, wordsCol, labelCol, w)
      w
    } finally t.unpersist()
  }

  /** Score the corpus with a trained weight table: (id, n_words,
    * score, keep = score > 0) — one narrow projection, scan speed. */
  def scoreLinear(docs: DataFrame, idCol: String, textCol: String,
                  weights: Seq[Long]): DataFrame =
    scoreLinearOfWords(
      docs.select(col(idCol), words(col(textCol)).as("__gqw")),
      idCol, "__gqw", weights)

  /** [[scoreLinear]] over an already-projected word-array column. */
  def scoreLinearOfWords(docs: DataFrame, idCol: String, wordsCol: String,
                         weights: Seq[Long]): DataFrame =
    docs.select(col(idCol),
        size(col(wordsCol)).cast("long").as("n_words"),
        scoreExpr(col(wordsCol), weights).as("score"))
      .withColumn("keep", (col("score") > 0).cast("int"))

  /** Blocklist pass — the EXCLUSION twin of GopherRules' required
    * stopwords: count each document's tokens that appear on a
    * curated blocklist and drop documents past a hit budget (C4
    * drops on ANY hit from the UT1 "bad words" list — `maxHits = 0`;
    * FineWeb keeps a fractional budget — pass `maxHits > 0`).
    * Output is total annotation: (id, n_words, n_blocked, keep).
    *
    * Scale shape: the list rides into the scan as a broadcast array
    * literal and the count is a doc-local array fold — ZERO
    * exchanges, the same narrow-pass shape as [[scoreLinearOfWords]]
    * (curated blocklists are KBs; a list too big for a literal
    * would switch to the explode + broadcast-semi-join + count
    * shape, whose join-back carries only (id, count)). Matching is
    * exact on lowercased whitespace tokens — the replayable
    * contract; substring matching belongs to the PII/regex family
    * ([[LineFilter]]). */
  def blocklistAnnotate(docs: DataFrame, idCol: String, textCol: String,
                        blocklist: Seq[String], maxHits: Long = 0L): DataFrame =
    blocklistAnnotateOfWords(
      docs.select(col(idCol), words(col(textCol)).as("__gqw")),
      idCol, "__gqw", blocklist, maxHits)

  /** [[blocklistAnnotate]] over an already-projected word array. */
  def blocklistAnnotateOfWords(docs: DataFrame, idCol: String,
                               wordsCol: String, blocklist: Seq[String],
                               maxHits: Long = 0L): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist: nothing to filter")
    val listLit = typedlit(blocklist)
    docs.select(col(idCol),
        size(col(wordsCol)).cast("long").as("n_words"),
        size(filter(col(wordsCol), w => array_contains(listLit, w)))
          .cast("long").as("n_blocked"))
      .withColumn("keep", (col("n_blocked") <= maxHits).cast("int"))
  }

  /** Filter-threshold RETENTION CURVE in one corpus pass — the
    * knob-tuning harness every curation pipeline runs BEFORE
    * committing a quality threshold at scale (the FineWeb/Gopher
    * ablation table: "keep score >= t" vs how much data survives):
    * for every score bucket `t` (scores floored to `step`-wide
    * buckets), the documents and weight (tokens) retained by the
    * filter `score >= t`, plus e4 shares of the full corpus.
    *
    * Scale shape: one map-combined histogram over (bucket) — output
    * bounded by score range / step, never by documents — then a
    * cumulative window over the HISTOGRAM (the ccnetBuckets
    * order-statistic pattern: the window orders distinct buckets,
    * not docs) and one broadcast totals row. All integer arithmetic
    * (counts, weight sums, truncating e4 shares); the bucket floor
    * uses double division exact for |score| < 2^52.
    *
    * @param scored frame carrying a per-doc integer score + weight
    * @return (threshold, docs_kept, weight_kept, doc_share_e4,
    *         weight_share_e4) — one row per occupied bucket,
    *         cumulative from the TOP score down */
  def retentionCurve(scored: DataFrame, scoreCol: String, weightCol: String,
                     step: Long = 1L): DataFrame = {
    require(step >= 1, s"retentionCurve: step must be >= 1, got $step")
    import org.apache.spark.sql.expressions.Window
    val bucket = (floor(col(scoreCol).cast("double") / lit(step.toDouble))
      .cast("long") * step).as("threshold")
    val hist = scored
      .select(bucket, col(weightCol).cast("long").as("__w"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("__d"), sum(col("__w")).as("__hw"))
    val totals = scored.agg(
      count(lit(1)).as("__td"),
      sum(col(weightCol).cast("long")).as("__tw"))
    // constant-key partition over the value histogram (bounded by
    // buckets, not docs) — non-foldable key, see ccnetBuckets
    val w = Window.partitionBy(col("threshold") * 0)
      .orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("docs_kept", sum(col("__d")).over(w))
      .withColumn("weight_kept", sum(col("__hw")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("threshold"), col("docs_kept"), col("weight_kept"),
        expr("docs_kept * 10000 div __td").as("doc_share_e4"),
        expr("weight_kept * 10000 div __tw").as("weight_share_e4"))
  }

  /** Trained Naive Bayes quality model: per-bucket log-odds and the
    * class-prior bias, both in micro-nat fixed point (e6). */
  final case class NbModel(biasE6: Long, weightsE6: Seq[Long])

  /** Closed-form multinomial Naive Bayes over hashed unigram buckets
    * — the GENERATIVE one-pass twin of [[trainPerceptron]] (and the
    * pre-fastText classifier CCNet-era quality filters actually
    * shipped): no epochs, no misclassification loop, just Laplace-
    * smoothed per-class occurrence counts folded into per-bucket
    * log-odds. Where the perceptron needs `epochs` corpus passes,
    * NB trains in ONE map-combined aggregation whose output is at
    * most `buckets` rows — the cheapest possible labeled-filter
    * bootstrap, and the standard first model before a discriminative
    * refit.
    *
    * Engine portability: the counts are exact BIGINTs, each log-odds
    * is `floor(1e6 * ln((cpos+1)(Nneg+B) / (cneg+1)(Npos+B)))` where
    * the two products are exact integers cast to double (exact below
    * 2^53 — ~9e15 token-count products, far above any single
    * training sample) and the division is one IEEE op — the
    * [[LanguageModel]] micro-nat discipline, so the model AND the
    * keep set replay in SQL. The bias is the smoothed log prior
    * ratio `floor(1e6 * ln((dpos+1)/(dneg+1)))`.
    *
    * Scale shape: one aggregation over exploded tokens (map-side
    * combined, `buckets`-bounded output), one tiny doc-count
    * aggregate; the returned table is B longs — broadcast-literal
    * sized by construction. At 100 TB train on a labeled SAMPLE and
    * let the narrow scoring pass be the only full-corpus touch (the
    * [[trainPerceptron]] recipe).
    */
  def trainNaiveBayes(docs: DataFrame, textCol: String, labelCol: String,
                      buckets: Int = 4096): NbModel = {
    val toks = docs.select(col(labelCol).cast("long").as("__y"),
      words(col(textCol)).as("__w"))
    val dc = toks.agg(
      sum(when(col("__y") === 1L, 1L).otherwise(0L)).as("dp"),
      sum(when(col("__y") === -1L, 1L).otherwise(0L)).as("dn")).head()
    val (dp, dn) = (dc.getLong(0), dc.getLong(1))
    require(dp > 0 && dn > 0,
      s"trainNaiveBayes: both classes must be present (got +$dp/-$dn)")
    val perBucket: Map[Int, (Long, Long)] = toks
      .select(col("__y"), explode(col("__w")).as("__wd"))
      .groupBy(bucketOf(col("__wd"), buckets).as("__b"))
      .agg(sum(when(col("__y") === 1L, 1L).otherwise(0L)).as("cp"),
        sum(when(col("__y") === -1L, 1L).otherwise(0L)).as("cn"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val np = perBucket.valuesIterator.map(_._1).sum
    val nn = perBucket.valuesIterator.map(_._2).sum
    // the count products below must stay EXACT doubles (< 2^53) or
    // the micro-nat replay contract breaks — and past Long range
    // they would wrap silently into NaN-weight corruption. cp <= np
    // and cn <= nn bound every per-bucket product, so one loud guard
    // covers all buckets; a corpus past it trains on a labeled
    // SAMPLE (the documented recipe — the classifier needs
    // thousands of exemplars, not the corpus).
    val maxProduct = math.max(
      (np + 1).toDouble * (nn + buckets).toDouble,
      (nn + 1).toDouble * (np + buckets).toDouble)
    require(maxProduct < (1L << 53).toDouble,
      f"trainNaiveBayes: count product $maxProduct%.3g exceeds exact " +
        "double range (2^53); train on a labeled sample instead")
    val w = (0 until buckets).map { b =>
      val (cp, cn) = perBucket.getOrElse(b, (0L, 0L))
      // exact integer products, one double division, floor — the
      // micro-nat replay contract (see scaladoc)
      math.floor(1e6 * math.log(
        ((cp + 1) * (nn + buckets)).toDouble /
          ((cn + 1) * (np + buckets)).toDouble)).toLong
    }
    NbModel(
      math.floor(1e6 * math.log((dp + 1).toDouble / (dn + 1).toDouble)).toLong,
      w)
  }

  /** Fused one-scan ensemble scorer: the perceptron margin AND the
    * Naive Bayes log-odds over a SINGLE words projection — a
    * multi-gate quality ensemble's scoring half pays one corpus
    * scan instead of one per gate plus an id join to zip them back
    * together (at 100 TB the scans are the whole cost; the per-row
    * folds are both narrow array aggregates against broadcast
    * weight literals and fuse into one codegen stage). Identical
    * values to [[scoreLinear]]/[[scoreNaiveBayes]] run separately —
    * spec-pinned. */
  def scoreEnsemble(docs: DataFrame, idCol: String, textCol: String,
                    linWeights: Seq[Long], nb: NbModel): DataFrame =
    docs.select(col(idCol), words(col(textCol)).as("__gqw"))
      .select(col(idCol),
        size(col("__gqw")).cast("long").as("n_words"),
        scoreExpr(col("__gqw"), linWeights).as("score"),
        (lit(nb.biasE6) + scoreExpr(col("__gqw"), nb.weightsE6))
          .as("score_e6"))
      .withColumn("keep_lin", (col("score") > 0).cast("int"))
      .withColumn("keep_nb", (col("score_e6") > 0).cast("int"))

  /** Score with a trained NB model: (id, n_words, score_e6, keep =
    * score_e6 > 0) — one narrow projection against the broadcast
    * log-odds literal, scan speed (the [[scoreLinear]] shape plus
    * the prior bias). */
  def scoreNaiveBayes(docs: DataFrame, idCol: String, textCol: String,
                      model: NbModel): DataFrame =
    docs.select(col(idCol),
        words(col(textCol)).as("__gqw"))
      .select(col(idCol),
        size(col("__gqw")).cast("long").as("n_words"),
        (lit(model.biasE6) +
          scoreExpr(col("__gqw"), model.weightsE6)).as("score_e6"))
      .withColumn("keep", (col("score_e6") > 0).cast("int"))

  /** Per-group percentile normalization of a score column — the
    * "don't let one domain's score distribution eat another's" move:
    * a GLOBAL threshold over a quality score silently drops entire
    * domains whose honest style scores low (legal text vs chat), so
    * production filters threshold each document's percentile WITHIN
    * its source instead, retaining the same fraction of every
    * domain while still cutting each domain's worst documents.
    *
    * `pct_e4` is the exact integer percent-rank in basis points:
    * `(rank - 1) * 10000 div (n - 1)` over a total order
    * (`scoreCol` ascending, `idCol` tiebreak), so 0 = the group's
    * worst document, 10000 = its best, and a single-document group
    * pins to 10000 (nothing below it). All-integer, replays
    * bit-identically in SQL's `row_number()`/`count(*)` windows.
    *
    * Scale shape: ONE shuffle on the group key, then two window
    * passes inside each partition — no joins, no second exchange
    * (rank and count share the partitioning). Skew bound = the
    * largest single source; a mega-domain that outgrows an executor
    * partition moves to the two-pass histogram form (bucket counts
    * per source, then a cumulative lookup), which trades exactness
    * of low-order rank bits for a bounded-memory merge. At typical
    * web-corpus shape (1e4-1e6 docs per host) the windowed form is
    * the right default.
    */
  def percentileNormalize(scored: DataFrame, groupCol: String,
                          scoreCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val wAll = Window.partitionBy(col(groupCol))
    scored
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("pct_e4",
        when(col("__n") > 1,
          expr("(__rk - 1) * 10000 div (__n - 1)"))
          .otherwise(lit(10000L)))
      .drop("__rk", "__n")
  }

  /** The two-pass HISTOGRAM form of [[percentileNormalize]] — the
    * documented mega-domain escape hatch, now as code: the windowed
    * form sorts each group inside one partition, so a single domain
    * that outgrows an executor partition (a 1e9-doc crawl host)
    * breaks it. This form never materializes a group in one place:
    * pass 1 buckets each score into `buckets` equal-width steps of
    * the group's [min, max] span (one map-combined agg for the
    * spans, one for the bucket counts — both bounded by
    * |groups| * buckets rows); pass 2 joins each doc to its
    * bucket's CUMULATIVE count of strictly-lower buckets, giving
    * `pct_e4 = below * 10000 div (n - 1)` — every doc in a bucket
    * shares the percentile of the bucket's floor, an error bounded
    * by the bucket's occupancy share (<= 1/buckets for uniform
    * scores; `PlannerSpec`'s twin test measures the bias against the
    * exact form). All arithmetic is integer on nonnegative operands,
    * so the approximation itself replays exactly in SQL.
    */
  /** Automated Readability Index (Senter & Smith 1967) in exact
    * integer fixed point — the grade-level proxy curation pipelines
    * bucket by when selecting for textbook-grade prose (alongside
    * the Gopher rules and the LM gates; ARI is the classic
    * characters-per-word × words-per-sentence readability formula
    * and the only mainstream one that needs no syllable counter, so
    * it replays exactly in SQL):
    *
    *   ARI = 4.71·(chars/words) + 0.5·(words/sentences) − 21.43
    *
    * restated in e2 fixed point with each term floored SEPARATELY on
    * nonnegative operands (`div` == `//`):
    *
    *   ari_e2 = floor(471·chars / words)
    *          + floor(50·words / sentences) − 2143
    *
    * chars = non-whitespace characters; words = whitespace tokens
    * (min 1 by construction — `split` of an empty string is one
    * empty token, making chars/words 0 for blank docs rather than a
    * division failure); sentences = `[.!?]+` runs, floored at 1 so
    * fragments score as one sentence. `grade` clamps ari_e2/100 into
    * [1, 14] — clamp BEFORE the division keeps the operand
    * nonnegative (Spark `div` truncates toward zero, DuckDB `//`
    * floors; they only agree ≥ 0).
    *
    * Scale shape: one narrow projection — counting expressions only,
    * no explode, no shuffle; codegen keeps it at scan speed.
    * @return (idCol, n_chars, n_words, n_sents, ari_e2, grade) */
  def readability(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
        col(idCol),
        length(regexp_replace(t, "\\s+", "")).cast("long").as("n_chars"),
        size(split(trim(t), "\\s+")).cast("long").as("n_words"),
        greatest(size(regexp_extract_all(t, lit("[.!?]+"), lit(0))), lit(1))
          .cast("long").as("n_sents"))
      .withColumn("ari_e2",
        expr("(471 * n_chars) div n_words") +
          expr("(50 * n_words) div n_sents") - lit(2143L))
      .withColumn("grade",
        least(expr("greatest(ari_e2, 100L) div 100"), lit(14L)))
  }

  /** Calibration curve (reliability diagram) over a trained quality
    * score: the margin range split into `bins` equal-width bins, per
    * bin the OBSERVED positive rate next to the MEAN margin — the
    * table that tells a user what an ensemble threshold actually
    * means ("margins in bin 17 ⇒ 91% of those docs are
    * positive-class"), pairing with [[retentionCurve]]'s volume half.
    *
    * Bins are ADAPTIVE (width = (max−min+1)/bins from a one-row
    * min/max pre-aggregation, broadcast back): perceptron margins
    * scale with corpus size — a fixed absolute step that gives 20
    * bins at one SF gives 500 one-document bins at 10× (observed),
    * and a reliability diagram of singleton bins says nothing.
    * Equal-MASS (ntile) bins would need a global sort of the scored
    * corpus; equal-width costs one extra tiny agg and keeps the
    * whole thing at scan shape.
    *
    * Integer discipline: `bin = (score−min)·bins div (max−min+1)`
    * divides nonnegative operands (truncating div == flooring //);
    * so does `pos_rate_e4`; the mean margin can be NEGATIVE, where
    * Spark's div (toward zero) and DuckDB's // (toward −∞) disagree —
    * `mean_score_e4` is computed sign-split (negate, divide
    * nonnegative, negate back), truncation toward zero in both
    * engines. Empty bins are absent rows, not zeros.
    *
    * Scale shape: one min/max agg + one map-combined aggregation
    * over the scored scan, ≤ `bins` output rows. */
  def calibrationCurve(scored: DataFrame, scoreCol: String,
                       labelCol: String, bins: Int = 20): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // slot-persisted: the min/max pre-agg and the binning agg are two
    // consumers of the SCORED frame — without the slot the scoring
    // scan (the dominant cost) re-runs per consumer
    val sl = PersistSlots.swap("quality.calibrationScored",
      scored.select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).as("__y")))
    val mm = sl.agg(min(col("__s")).as("__mn"), max(col("__s")).as("__mx"))
    sl.crossJoin(broadcast(mm))
      .select(col("__s"), col("__y"), col("__mn"), col("__mx"))
      .groupBy(expr(s"(__s - __mn) * $bins div (__mx - __mn + 1)")
        .as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("__y") > 0).cast("long")).as("n_pos"),
        sum(col("__s")).as("sum_score"),
        max(col("__mn")).as("__mn"), max(col("__mx")).as("__mx"))
      .withColumn("bin_lo",
        expr(s"__mn + bin * (__mx - __mn + 1) div $bins"))
      .withColumn("pos_rate_e4", expr("n_pos * 10000 div n_docs"))
      .withColumn("mean_score_e4",
        when(col("sum_score") >= 0,
          expr("sum_score * 10000 div n_docs"))
          .otherwise(-expr("(-sum_score) * 10000 div n_docs")))
      .select(col("bin"), col("bin_lo"), col("n_docs"), col("n_pos"),
        col("pos_rate_e4"), col("mean_score_e4"))
  }

  def percentileNormalizeHist(scored: DataFrame, groupCol: String,
                              scoreCol: String,
                              buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val spans = scored.groupBy(col(groupCol))
      .agg(min(col(scoreCol)).cast("long").as("__lo"),
        max(col(scoreCol)).cast("long").as("__hi"),
        count(lit(1)).as("__n"))
    // slot-persisted: the histogram side and the final join-back
    // BOTH read this frame, and the exchanges differ (partial agg vs
    // raw rows) so exchange reuse can't deduplicate them — without
    // the persist the scored input (often a full scoring scan)
    // would execute once per consumer
    val bucketed = PersistSlots.swap("quality.normHistBucketed",
      scored.join(spans, groupCol)
        // span + 1 so max lands in bucket B-1, not B; single-value
        // groups collapse to bucket 0
        .withColumn("__b",
          expr(s"(($scoreCol - __lo) * $buckets) div (__hi - __lo + 1)")
            .cast("int")))
    val hist = bucketed.groupBy(col(groupCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val below = hist
      .withColumn("__below", sum(col("__c")).over(wCum) - col("__c"))
      .select(col(groupCol), col("__b"), col("__below"))
    bucketed.join(below, Seq(groupCol, "__b"))
      .withColumn("pct_e4",
        when(col("__n") > 1, expr("__below * 10000 div (__n - 1)"))
          .otherwise(lit(10000L)))
      .drop("__b", "__lo", "__hi", "__n", "__below")
  }
}
