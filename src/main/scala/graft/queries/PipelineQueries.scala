package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.bpeishTokenCount
import graft.operators.Packing

/** Corpus-layout operators (sharding + sequence packing) over the
  * documents table — the last mile of a training-data pipeline.
  * Shard ids use portable md5 arithmetic (Spark `conv` = DuckDB
  * `CAST('0x'||hex)`), so layout decisions replay bit-identically in
  * the oracle.
  */
object PipelineQueries {

  private val SHARDS = 8
  private val BUDGET = 2048L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic sharding: uniform md5 buckets, per-shard stats
    "q_shard" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          Packing.shardId("doc_id", SHARDS).as("shard"),
          bpeishTokenCount(col("text")).cast("long").as("n_tok"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"))),

    // deterministic hash sample: stable holdout selection, exact oracle
    "q_sample" -> ((s, dir) =>
      graft.operators.Sampling.hashSample(
          Tables(s, dir, "documents"), "doc_id", keep = 3, outOf = 16)
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    // priorities over md5-uniforms): exactly 200 docs, odds
    // proportional to length, no row twice
    "q_weighted_sample" -> ((s, dir) =>
      graft.operators.Sampling.weightedSample(
        Tables(s, dir, "documents"), "doc_id", "n_chars", k = 200)),

    // stratified form: 20 weighted draws PER LANGUAGE through the
    // bounded per-key TopK (log-scale scores so round6 is relative
    // resolution); lang rides as its 48-bit hash for TopK's integral
    // key contract
    "q_weighted_stratified" -> ((s, dir) =>
      graft.operators.Sampling.weightedSamplePerKey(
        Tables(s, dir, "documents")
          .select(graft.operators.Packing.hash48c(col("lang")).as("lang_h"),
            col("doc_id"), col("n_chars")),
        "lang_h", "doc_id", "n_chars", k = 20)),

    // offset-binned packing: window-function form with an exact oracle
    "q_pack" -> ((s, dir) =>
      Packing.offsetBinned(
          Tables(s, dir, "documents")
            .select(col("doc_id"),
              bpeishTokenCount(col("text")).cast("long").as("n_tok")),
          "doc_id", "n_tok", SHARDS, BUDGET)
        .select(col("doc_id"), col("shard"), col("cum_before"), col("pack_id"))),

    // per-source BYTE-budget write plan: file counts + per-file row
    // caps that keep every output file under the target size — the
    // small-files/giant-files planner for a partitioned-by-source
    // write (plans on bytes, not rows: long-document sources need
    // more files per row). Target scaled so sf0.01 exercises
    // multi-file splits.
    "q_write_plan" -> ((s, dir) =>
      graft.operators.Layout.writePlan(
        Tables(s, dir, "documents"), "source", "text",
        targetBytes = WRITE_TARGET_BYTES)),

    // length-bucketing for padded batches (the no-concat complement
    // of q_pack): smallest power-of-two boundary >= token count,
    // exact e4 padding efficiency per bucket — all-integer, one
    // narrow CASE + one aggregation
    "q_length_buckets" -> ((s, dir) =>
      Packing.lengthBuckets(
        Tables(s, dir, "documents")
          .select(bpeishTokenCount(col("text")).cast("long").as("n_tok")),
        "n_tok")),

    // the flagship end-to-end training-data pipeline, one plan:
    // quality-filter -> exact near-dup removal (fingerprint survivor)
    // -> deterministic sharding -> per-shard corpus stats. Every stage
    // is an exact operator, so the whole pipeline replays in SQL.
    "q_pipeline_e2e" -> ((s, dir) => {
      import graft.functions.TextFunctions.words
      // project the word array ONCE, then derive every signal from it
      // (Spark HOF/regex expressions have no CSE — the repo-wide rule)
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), words(col("text")).as("__w"))
        .select(col("doc_id"), col("n_chars"),
          size(col("__w")).cast("long").as("wc"),
          array_sort(array_distinct(col("__w"))).as("__dw"))
      val cpwE4 = floor(col("n_chars").cast("double") / col("wc") * 10000)
        .cast("long")
      val divE4 = floor(size(col("__dw")).cast("double") / col("wc") * 10000)
        .cast("long")
      val kept = docs.filter(col("wc") >= 30 && col("wc") <= 300 &&
        cpwE4 <= 80000L && divE4 >= 3000L)
      val survivors = kept
        .withColumn("fp", md5(concat_ws(" ", col("__dw"))))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("wc")).as("wc_min"))
      survivors
        .select(col("doc_id"),
          Packing.shardId("doc_id", SHARDS).as("shard"), col("wc_min"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("wc_min")).as("sum_wc"))
    }),

    // the round-5 composed curation pipeline, one plan: quality
    // filter -> NEAR-dup removal (winnow Jaccard pairs -> connected
    // components, survivor = min id) -> benchmark decontamination
    // (3-gram overlap vs the doc_id%97 holdout) -> context-window
    // chunk statistics per shard. The full "raw documents to training
    // sequences" path, every stage exact and SQL-replayable.
    "q_curate_e2e" -> ((s, dir) => {
      // the Curation builder verbatim: one shared word-array
      // projection feeds quality filter -> winnow near-dedup
      // components -> 3-gram holdout decontamination -> closed-form
      // chunk stats, all one plan
      val all = graft.operators.Curation(
        Tables(s, dir, "documents"), "doc_id", "text", col("n_chars"))
      val eval = all.docs.filter(col("doc_id") % 97 === 0)
      all.qualityFilter().nearDedup().decontaminate(eval)
        .chunkStats(shards = SHARDS)
    }),

    // the round-6 curation composition: Gopher document rules ->
    // bigram-LM perplexity gate (model from the doc_id%5 reference
    // split, threshold at ~the corpus median) -> context-window chunk
    // statistics per shard, one plan. The RefinedWeb-flavored sibling
    // of q_curate_e2e's quality->near-dedup->decontaminate path.
    "q_curate_rw" -> ((s, dir) => {
      val all = graft.operators.Curation(
        Tables(s, dir, "documents"), "doc_id", "text", col("n_chars"))
      val ref = all.docs.filter(col("doc_id") % 5 === 0)
      all.gopherFilter(minWords = 20)
        .perplexityFilter(ref, maxAvgNllE6 = 3500000L)
        .chunkStats(shards = SHARDS)
    }),

    // z-order layout: Morton-interleave (user_id mod 256, floor(value))
    // and bucket the curve — per-bucket min/max of BOTH dimensions stay
    // narrow, which is exactly the parquet-stats-pruning property the
    // layout exists for (ZOrderSpec pins the locality bound)
    "q_zorder" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"),
          (col("user_id") % 256).as("ux"),
          floor(col("value")).cast("long").as("vy"))
        .withColumn("z", graft.operators.ZOrder.zvalue2(col("ux"), col("vy"), bits = 9))
      ev.groupBy(floor(col("z") / 4096).cast("long").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("ux")).as("min_ux"), max(col("ux")).as("max_ux"),
          min(col("vy")).as("min_vy"), max(col("vy")).as("max_vy"))
    }),

    // temperature-balanced class downsampling (alpha = 0.5): keep
    // rate min(1, k/sqrt(N_lang)) — per-class-only IEEE arithmetic,
    // so the sampled SET replays exactly in SQL
    "q_temp_sample" -> ((s, dir) =>
      graft.operators.Sampling.temperatureSample(
          Tables(s, dir, "documents"), "doc_id", "lang", k = 5.0)
        .select(col("doc_id"), col("lang"))),

    // deterministic weighted source mixing: the training-mixture
    // step — per-source keep rates (25/50/75/100% here) pinned by
    // the md5 shard of the doc id, so the mixture replays exactly
    "q_mix" -> ((s, dir) =>
      graft.operators.Sampling.hashStratified(
          Tables(s, dir, "documents"), "doc_id", "source", MIX_BP)
        .select(col("doc_id"), col("source"))),

    // exact quota sampling: exactly 10 docs per source, md5 order —
    // TopK's bounded partial aggregate instead of a rank window
    "q_quota" -> ((s, dir) =>
      graft.operators.Sampling.quotaSample(
          Tables(s, dir, "documents"), "doc_id", "source", n = 10)
        .select(col("doc_id"), col("source"))),

    // DSIR-style importance selection: hashed-unigram votes against a
    // target exemplar set (docs with doc_id % 7 == 0 stand in for the
    // quality corpus) — integer sign-of-log-ratio scoring, so the
    // keep set replays exactly in SQL
    "q_dsir" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.operators.Sampling.importanceVotes(
        docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text",
        buckets = DSIR_B)
    }),

    // token-budget mixing: char budgets per source, even sources get
    // a small budget (downsample) and odd sources a large one (2+
    // epoch upsample at sf0.01); src18/19 have no budget and drop
    "q_token_mix" -> ((s, dir) =>
      graft.operators.Sampling.tokenBudgetMix(
        Tables(s, dir, "documents"), "doc_id", "source", "n_chars",
        TOKEN_BUDGETS)
        .select(col("doc_id"), col("source"), col("epoch"))),

    // epoch-capped token-budget waterfill: derive per-source budgets
    // from ONE global budget under a max-epochs cap (sqrt-smoothed
    // proportional fill, capped sources release budget to the rest) —
    // the planner whose output feeds q_token_mix's budgets map
    "q_budget_waterfill" -> ((s, dir) =>
      graft.operators.Sampling.budgetWaterfill(
        Tables(s, dir, "documents"), "source", "n_chars",
        budget = WF_BUDGET, maxEpochs = WF_EPOCHS)),

    // filter-threshold retention curve over the trained quality
    // score: how many docs/tokens survive "score >= t" per t bucket —
    // the one-pass ablation table a threshold choice rides on
    "q_threshold_sweep" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("__y", when(col("lang") === "en", 1).otherwise(-1))
      val w = graft.operators.Quality.trainPerceptron(
        docs, "text", "__y", buckets = QUAL_B, epochs = 2)
      graft.operators.Quality.retentionCurve(
        graft.operators.Quality.scoreLinear(docs, "doc_id", "text", w),
        "score", "n_words", step = 5L)
    }),

    // fastText-style quality filter: label en docs positive, train a
    // 2-epoch integer batch perceptron over hashed unigram buckets,
    // score the corpus — trained weights AND keep set replay exactly
    // in SQL (the whole train loop unrolls into CTEs)
    "q_quality_filter" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("__y", when(col("lang") === "en", 1).otherwise(-1))
      val w = graft.operators.Quality.trainPerceptron(
        docs, "text", "__y", buckets = QUAL_B, epochs = 2)
      graft.operators.Quality.scoreLinear(docs, "doc_id", "text", w)
    }),

    // closed-form Naive Bayes quality filter — the one-pass
    // GENERATIVE twin of q_quality_filter's perceptron: same labels,
    // same hashed buckets, but the model is Laplace-smoothed
    // log-odds from ONE aggregation (no epochs); micro-nat integer
    // scores replay exactly in SQL
    "q_nb_quality" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("__y", when(col("lang") === "en", 1).otherwise(-1))
      val m = graft.operators.Quality.trainNaiveBayes(
        docs, "text", "__y", buckets = QUAL_B)
      graft.operators.Quality.scoreNaiveBayes(docs, "doc_id", "text", m)
    }),

    // per-source percentile normalization of the trained quality
    // score: a GLOBAL threshold would drop whole domains whose
    // honest style scores low, so the keep decision thresholds each
    // document's exact integer percent-rank WITHIN its source —
    // the same retained fraction from every domain, each domain's
    // worst quartile cut. One shuffle on source, no joins after it.
    "q_score_normalize" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("__y", when(col("lang") === "en", 1).otherwise(-1))
      val w = graft.operators.Quality.trainPerceptron(
        docs, "text", "__y", buckets = QUAL_B, epochs = 2)
      val scored = graft.operators.Quality
        .scoreLinear(docs, "doc_id", "text", w)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      graft.operators.Quality
        .percentileNormalize(scored, "source", "score", "doc_id")
        .select(col("doc_id"), col("source"), col("score"), col("pct_e4"),
          (col("pct_e4") >= NORM_KEEP_E4).cast("int").as("keep"))
    }),

    // the two-pass HISTOGRAM twin of q_score_normalize — the
    // mega-domain form that never sorts a whole source in one
    // partition: equal-width score buckets per source, cumulative
    // strictly-below counts over the BUCKET histogram, every doc
    // inherits its bucket-floor percentile (error bounded by bucket
    // occupancy; the exact twin stays the default at normal domain
    // sizes). Same keep threshold as the exact form.
    "q_score_normalize_hist" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("__y", when(col("lang") === "en", 1).otherwise(-1))
      val w = graft.operators.Quality.trainPerceptron(
        docs, "text", "__y", buckets = QUAL_B, epochs = 2)
      val scored = graft.operators.Quality
        .scoreLinear(docs, "doc_id", "text", w)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      graft.operators.Quality
        .percentileNormalizeHist(scored, "source", "score",
          buckets = NORM_HIST_B)
        .select(col("doc_id"), col("source"), col("score"), col("pct_e4"),
          (col("pct_e4") >= NORM_KEEP_E4).cast("int").as("keep"))
    }),

    // quality ENSEMBLE: majority vote of three independent gates —
    // the trained perceptron, the closed-form Naive Bayes, and the
    // Gopher-style length rule — the "no single filter decides"
    // pattern production curation actually ships (each model's
    // mistakes are uncorrelated; the ensemble keeps the union of
    // their agreement). One corpus scan per scorer, all narrow.
    "q_quality_ensemble" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("__y", when(col("lang") === "en", 1).otherwise(-1))
      val w = graft.operators.Quality.trainPerceptron(
        docs, "text", "__y", buckets = QUAL_B, epochs = 2)
      val nb = graft.operators.Quality.trainNaiveBayes(
        docs, "text", "__y", buckets = QUAL_B)
      // FUSED scoring (round 14): both gates fold over one words
      // projection in a single corpus scan — no per-gate scans, no
      // id join to zip the votes back together
      graft.operators.Quality
        .scoreEnsemble(docs, "doc_id", "text", w, nb)
        .select(col("doc_id"), col("n_words"),
          col("keep_lin").as("vote_perc"), col("keep_nb").as("vote_nb"))
        .withColumn("vote_len",
          (col("n_words") >= 30 && col("n_words") <= 300).cast("int"))
        .withColumn("votes",
          col("vote_perc") + col("vote_nb") + col("vote_len"))
        .withColumn("keep", (col("votes") >= 2).cast("int"))
        .select(col("doc_id"), col("vote_perc"), col("vote_nb"),
          col("vote_len"), col("votes"), col("keep"))
    }),

    // calibration curve (round 16): the reliability diagram over the
    // ensemble's trained margin — 20 adaptive equal-width margin
    // bins, per bin observed positive rate vs mean margin (e4) — the
    // table that says what a threshold MEANS (q_threshold_sweep says
    // what it COSTS). One min/max agg + one map-combined agg over
    // the scoring scan, <= 20 rows.
    "q_calibration" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("__y", when(col("lang") === "en", 1).otherwise(-1))
      val w = graft.operators.Quality.trainPerceptron(
        docs, "text", "__y", buckets = QUAL_B, epochs = 2)
      val scored = graft.operators.Quality
        .scoreLinear(docs, "doc_id", "text", w)
        .join(docs.select(col("doc_id"), col("__y")), "doc_id")
      graft.operators.Quality.calibrationCurve(
        scored, "score", "__y", bins = 20)
    }),

    // source-quality PageRank: nodes are (source, lang) corpora,
    // edges link nodes whose documents share a normalized 6-word
    // opening (the shared-boilerplate/copy signal a host-quality
    // ranker keys on at web scale); 5 damped iterations in integer
    // fixed point, so the whole iteration replays exactly in SQL.
    // Prefixes on more than PR_MAX_DF nodes drop BEFORE the
    // self-join — the q_label_prop LP_MAX_DF discipline: a
    // stop-prefix ("this page requires javascript ...") shared by
    // 10^6 docs is no copy evidence AND would emit df^2 join rows
    // per prefix at web scale; the node-distinct projection ahead
    // of the df window additionally collapses each node's repeat
    // uses of one opening to a single join row. The cap is pinned
    // semantics, replayed in the oracle, and BITES at sf0.01 (one
    // prefix reaches node-df 3; 48 -> 42 edges).
    "q_pagerank" -> ((s, dir) => {
      val d0 = Tables(s, dir, "documents").select(
        concat_ws("/", col("source"), col("lang")).as("node"),
        concat_ws(" ", slice(
          graft.functions.TextFunctions.words(col("text")), 1, 6)).as("pfx"))
      // node universe from the UNCAPPED frame: a node whose every
      // opening is boilerplate still ranks (isolated, damping base)
      val nodes = d0.select(col("node"))
      val d = d0.distinct()
        .withColumn("__df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("pfx"))))
        .filter(col("__df") <= PR_MAX_DF).drop("__df")
      val e = d.alias("a").join(d.alias("b"),
          col("a.pfx") === col("b.pfx") && col("a.node") =!= col("b.node"))
        .select(col("a.node").as("src"), col("b.node").as("dst"))
      graft.operators.PageRank.ranks(e, "src", "dst", nodes, "node",
        iters = PR_ITERS)
    }),

    // count-min sketch point queries: one bounded-memory pass builds
    // the d x w grid, then the 15 heaviest terms (exact) are checked
    // against the sketch's estimate — est >= exact always, and
    // est <= exact + eps*n on this grid (the q_approx_distinct
    // bound-check discipline for the CMS guarantee)
    "q_cms" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(explode(
          graft.functions.TextFunctions.words(col("text"))).as("term"))
      val cms = graft.functions.CountMin.sketch(toks, "term",
        eps = CMS_EPS, delta = 0.02)
      // every grid row sums to n (each token adds 1 per row) — the
      // bound's n needs no extra pass
      val n = cms.counters.take(cms.w).sum
      val cap = math.ceil(CMS_EPS * n).toLong
      val est = udf((t: String) => cms.estimate(t))
      toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term").asc).limit(15)
        .select(col("term"), col("cnt"),
          (est(col("term")) >= col("cnt") &&
            est(col("term")) <= col("cnt") + lit(cap)).cast("int")
            .as("within_bound"))
    }),

    // semi-supervised host labeling: seed TWO trusted/spam sources
    // (src0 good, src1 bad — the handful-of-known-domains shape),
    // spread belief over the shared-content graph: (source, lang)
    // corpora are linked when they share >= 10 distinct word
    // 3-grams (the boilerplate/copy signal). Grams shared by more
    // than LP_MAX_DF nodes drop BEFORE the self-join — the dedup
    // df-cap discipline: a universal stop-gram is no copy evidence
    // AND would fan the join out df^2-per-gram at web scale; the
    // cap is part of the pinned semantics, so it oracle-checks.
    // 3 unrolled integer fixed-point rounds (Zhu-Ghahramani
    // harmonic form), so every unlabeled corpus comes back with the
    // belief its copy-neighbors lend it — a properly GRADED field
    // (mixed neighborhoods average), not a seed echo; exact SQL
    // replay
    "q_label_prop" -> ((s, dir) => {
      import graft.functions.TextFunctions.{words, shinglesOfWords}
      val w = Tables(s, dir, "documents").select(
        concat_ws("/", col("source"), col("lang")).as("node"),
        words(col("text")).as("__w"))
      val grams = w.select(col("node"),
          explode(array_distinct(shinglesOfWords(col("__w"), 3)))
            .as("gram"))
        .distinct()
        // node-level df as a window count: ONE exchange on the gram,
        // output stays gram-partitioned for the join that follows
        // (the ngramJaccardPairs pattern)
        .withColumn("__df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))))
        .filter(col("__df") <= LP_MAX_DF).drop("__df")
      val e = grams.alias("a").join(grams.alias("b"),
          col("a.gram") === col("b.gram") && col("a.node") =!= col("b.node"))
        .select(col("a.node").as("src"), col("b.node").as("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("__shared"))
        .filter(col("__shared") >= LP_MIN_SHARED)
        .select(col("src"), col("dst"))
      val nodes = w.select(col("node"))
      val seeds = nodes.distinct().select(col("node"),
          when(col("node").startsWith("src0/"), 1)
            .when(col("node").startsWith("src1/"), -1).as("y"))
        .filter(col("y").isNotNull)
      graft.operators.LabelProp.propagate(e, "src", "dst",
          seeds, "node", "y", nodes, "node", iters = LP_ITERS)
        .withColumn("side",
          when(col("belief_e12") > graft.operators.LabelProp.MID, 1)
            .when(col("belief_e12") < graft.operators.LabelProp.MID, -1)
            .otherwise(0))
    })
  )

  /** q_pagerank iteration count (constant by design — rank consumers
    * threshold, they don't chase a fixpoint). */
  private val PR_ITERS = 5

  /** q_pagerank prefix df cap (nodes per 6-word opening): openings
    * shared by more nodes are stop-boilerplate, not copy evidence,
    * and would fan the edge self-join out df^2 per prefix — dropped
    * before the join (the LP_MAX_DF discipline). 2 BITES at sf0.01
    * (node-df reaches 3; 48 -> 42 edges), so the gate exercises the
    * capped path; production would set ~10^3. */
  private val PR_MAX_DF = 2

  /** q_label_prop unrolled propagation rounds (constant by design —
    * belief consumers threshold at MID, they don't chase a fixpoint). */
  private val LP_ITERS = 3

  /** q_label_prop edge threshold: two corpora are linked when they
    * share at least this many distinct word 3-grams. */
  private val LP_MIN_SHARED = 10

  /** q_label_prop gram df cap (nodes per gram): grams on more nodes
    * are stop-boilerplate, not copy evidence, and would fan the
    * candidate join out quadratically — dropped before the join.
    * 5 BITES at sf0.01 (gram df reaches 7; 454 -> 436 edges), so
    * the gate exercises the capped path, not a no-op. */
  private val LP_MAX_DF = 5

  /** q_score_normalize keep threshold in basis points: retain the
    * top 75% of every source's own score distribution. */
  private val NORM_KEEP_E4 = 2500L

  /** q_score_normalize_hist bucket count (64 over ~25-doc sf0.01
    * sources exercises both the shared-bucket and the
    * one-doc-per-bucket regimes). */
  private val NORM_HIST_B = 64

  /** q_write_plan target file size: 2 KiB splits sf0.01's ~7-9 KiB
    * per-source payloads into several files (production: 512 MiB). */
  private val WRITE_TARGET_BYTES = 2048L

  /** q_cms overestimate bound (fraction of total token count). */
  private val CMS_EPS = 0.001

  /** q_quality_filter feature buckets (same order of magnitude as
    * DSIR's — enough to keep the synthetic vocabulary from
    * colliding, small enough that the weight literal ships cheap). */
  private val QUAL_B = 4096

  /** Per-source char budgets for q_token_mix: absolute values chosen
    * so sf0.01 exercises both regimes (source totals there are
    * ~7-9 k chars: 4 k -> ~0.5 epoch, 20 k -> ~2.5 epochs). */
  private val TOKEN_BUDGETS: Map[String, Long] =
    (0 until 18).map(i => s"src$i" -> (if (i % 2 == 0) 4000L else 20000L)).toMap

  /** q_dsir feature-bucket count (small enough that the vote literal
    * array stays cheap to ship, large enough that the synthetic
    * vocabulary doesn't all collide). */
  private val DSIR_B = 1024

  /** q_budget_waterfill global char budget + epoch cap: calibrated so
    * the sf0.01 GATE exercises BOTH regimes (per-source totals there
    * are 6.3-8.6 k chars -> cap/weight ratios 318-373; the fill rate
    * lands mid-range, so the cheap-to-cap sources cap and release
    * budget to the rest — the waterfill's whole point). */
  private val WF_BUDGET = 590000L
  private val WF_EPOCHS = 4

  /** Mixture weights in basis points: src0 -> 2500 ... cycling 25%,
    * 50%, 75%, 100% across the 20 synthetic sources. */
  private val MIX_BP: Map[String, Int] =
    (0 until 20).map(i => s"src$i" -> 2500 * (i % 4 + 1)).toMap

  private val SHARD_SQL =
    s"CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % $SHARDS"
  private val TOK_SQL =
    """CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT)"""

  private val ZORDER_SQL =
    graft.operators.ZOrder.zvalue2Sql("ux", "vy", bits = 9)

  // the composed curation replay: quality filter -> winnow-pair
  // reachability components (survivor = min id) -> 3-gram holdout
  // decontamination -> closed-form chunk stats per shard
  private val curateOracle: String =
    s"""WITH RECURSIVE
       |m AS (SELECT doc_id, n_chars,
       |        regexp_split_to_array(trim(lower(text)), '\\s+') AS wl
       |      FROM documents),
       |e AS (SELECT doc_id, wl, CAST(len(wl) AS BIGINT) AS wc,
       |        CAST(floor(CAST(n_chars AS DOUBLE) / len(wl) * 10000) AS BIGINT)
       |          AS cpw_e4,
       |        CAST(floor(CAST(len(list_distinct(wl)) AS DOUBLE) / len(wl)
       |          * 10000) AS BIGINT) AS div_e4
       |      FROM m),
       |keptw AS (SELECT doc_id, wl, wc FROM e
       |          WHERE wc >= 30 AND wc <= 300
       |            AND cpw_e4 <= 80000 AND div_e4 >= 3000),
       |${DedupQueries.winnowPairCtes("keptw")},
       |und AS (SELECT id_a AS a, id_b AS b FROM wpairs
       |        UNION SELECT id_b, id_a FROM wpairs),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM keptw
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
       |comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
       |surv AS (SELECT k.doc_id, k.wc FROM comp JOIN keptw k USING (doc_id)
       |         WHERE comp.component = comp.doc_id),
       |sh3 AS (SELECT doc_id,
       |          CASE WHEN len(wl) >= 3 THEN
       |            list_transform(range(1, len(wl) - 1),
       |              i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])
       |          ELSE CAST([] AS VARCHAR[]) END AS s
       |        FROM m),
       |ex AS (SELECT doc_id, unnest(list_distinct(s)) AS g FROM sh3),
       |ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % 97 = 0),
       |contam AS (SELECT DISTINCT ex.doc_id FROM ex JOIN ev USING (g)
       |           WHERE ex.doc_id % 97 <> 0),
       |clean AS (SELECT s.doc_id, s.wc FROM surv s
       |          WHERE s.doc_id % 97 <> 0
       |            AND s.doc_id NOT IN (SELECT doc_id FROM contam)),
       |ct AS (SELECT doc_id, wc,
       |         greatest(CAST(ceil((wc - 50) / 25.0) AS BIGINT), 0) + 1
       |           AS n_chunks
       |       FROM clean),
       |cs AS (SELECT doc_id, n_chunks,
       |         CAST(list_sum(list_transform(range(0, n_chunks),
       |           i -> least(50, wc - 25 * i))) AS BIGINT) AS sum_tok
       |       FROM ct)
       |SELECT $SHARD_SQL AS shard, count(*) AS n_docs,
       |  CAST(sum(n_chunks) AS BIGINT) AS sum_chunks,
       |  CAST(sum(sum_tok) AS BIGINT) AS sum_tok
       |FROM cs GROUP BY 1""".stripMargin

  // the round-6 composition replay: gopher rule keeps ∩ perplexity
  // keeps (per-doc scores are model-fixed, so scoring all docs and
  // intersecting equals scoring the survivors), then chunk stats
  private val curateRwOracle: String = {
    val sw = TextQueries.sqlStopwords("en")
    s"""WITH w AS (SELECT doc_id,
       |        regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
       |      FROM documents),
       |gm AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS wc,
       |    CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
       |      AS BIGINT) AS sum_len,
       |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
       |      AS BIGINT) AS n_alpha,
       |    CAST(len(list_intersect(list_distinct(ws), $sw)) AS BIGINT)
       |      AS stop_hits,
       |    CAST(len(list_filter(ws, x -> contains(x, '#')
       |      OR contains(x, '...') OR contains(x, '…'))) AS BIGINT) AS n_sym
       |  FROM w),
       |gk AS (SELECT doc_id, wc FROM gm
       |  WHERE wc BETWEEN 20 AND 100000
       |    AND (sum_len * 10000) // greatest(wc, 1) BETWEEN 30000 AND 100000
       |    AND (n_alpha * 10000) // greatest(wc, 1) >= 8000
       |    AND stop_hits >= 2
       |    AND (n_sym * 10000) // greatest(wc, 1) <= 1000),
       |wr AS (SELECT ws FROM w WHERE doc_id % 5 = 0),
       |uni AS (SELECT u, CAST(count(*) AS BIGINT) AS c FROM (
       |          SELECT unnest(ws) AS u FROM wr) GROUP BY u),
       |big AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c12 FROM (
       |          SELECT unnest(ws[1:len(ws)-1]) AS prev,
       |                 unnest(ws[2:len(ws)]) AS cur
       |          FROM wr WHERE len(ws) >= 2) GROUP BY prev, cur),
       |tot AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS total FROM wr),
       |dp AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS prev,
       |         unnest(ws[2:len(ws)]) AS cur
       |       FROM w WHERE len(ws) >= 2),
       |pc AS (SELECT doc_id,
       |        CAST(floor(1000000.0 * (-ln(
       |          CASE WHEN c12 IS NOT NULL
       |                 THEN CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)
       |               WHEN c2 IS NOT NULL
       |                 THEN 0.4 * (CAST(c2 AS DOUBLE) / CAST(total AS DOUBLE))
       |               ELSE 0.4 / (CAST(total AS DOUBLE) * 10.0)
       |          END))) AS BIGINT) AS cost_e6
       |      FROM dp
       |      LEFT JOIN big USING (prev, cur)
       |      LEFT JOIN (SELECT u AS prev, c AS c1 FROM uni) USING (prev)
       |      LEFT JOIN (SELECT u AS cur, c AS c2 FROM uni) USING (cur)
       |      CROSS JOIN tot),
       |pk AS (SELECT doc_id FROM pc GROUP BY doc_id
       |       HAVING CAST(sum(cost_e6) // count(*) AS BIGINT) <= 3500000),
       |clean AS (SELECT gk.doc_id, gk.wc FROM gk JOIN pk USING (doc_id)),
       |ct AS (SELECT doc_id, wc,
       |         greatest(CAST(ceil((wc - 50) / 25.0) AS BIGINT), 0) + 1
       |           AS n_chunks
       |       FROM clean),
       |cs AS (SELECT doc_id, n_chunks,
       |         CAST(list_sum(list_transform(range(0, n_chunks),
       |           i -> least(50, wc - 25 * i))) AS BIGINT) AS sum_tok
       |       FROM ct)
       |SELECT $SHARD_SQL AS shard, count(*) AS n_docs,
       |  CAST(sum(n_chunks) AS BIGINT) AS sum_chunks,
       |  CAST(sum(sum_tok) AS BIGINT) AS sum_tok
       |FROM cs GROUP BY 1""".stripMargin
  }

  // q_pagerank replay: the same integer fixed-point iteration
  // unrolled into chained CTEs — damping base and per-edge floor
  // divisions are exact BIGINT arithmetic on both engines (DuckDB
  // `//` == Spark `div` for non-negative operands), so all 5 rounds
  // replay bit-identically
  private val pagerankOracle: String = {
    val scale = graft.operators.PageRank.SCALE
    val base = scale * 15 / 100 // damping 85%
    val iterCtes = (1 to PR_ITERS).map { k =>
      s"""r$k AS (SELECT nd.node,
         |  ($base // (SELECT n FROM nn)) + (85 * coalesce(c.s, 0)) // 100 AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst, sum(r.r // dg.deg) AS s
         |    FROM e JOIN r${k - 1} r ON r.node = e.src
         |           JOIN deg dg ON dg.src = e.src
         |    GROUP BY e.dst) c ON c.dst = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH d0 AS (SELECT source || '/' || lang AS node,
       |    array_to_string(
       |      (regexp_split_to_array(trim(lower(text)), '\\s+'))[1:6], ' ')
       |      AS pfx
       |  FROM documents),
       |nodes AS (SELECT DISTINCT node FROM d0),
       |d AS (SELECT node, pfx FROM
       |        (SELECT node, pfx,
       |           count(*) OVER (PARTITION BY pfx) AS df
       |         FROM (SELECT DISTINCT node, pfx FROM d0))
       |      WHERE df <= $PR_MAX_DF),
       |e AS (SELECT DISTINCT a.node AS src, b.node AS dst
       |      FROM d a JOIN d b ON a.pfx = b.pfx AND a.node <> b.node),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, $scale // (SELECT n FROM nn) AS r FROM nodes),
       |$iterCtes
       |SELECT node, CAST(r AS BIGINT) AS rank_e12 FROM r$PR_ITERS""".stripMargin
  }

  // q_label_prop replay: the shared-3-gram edge set (node-distinct
  // grams, pair count >= threshold; the a/b equality join already
  // emits both directions), seeds clamped every round, unseeded
  // nodes replaced by the floor mean of their neighbors — beliefs stay in
  // [0, SCALE] so DuckDB's floor `//` and Spark's truncating `div`
  // agree on every division
  private val labelPropOracle: String = {
    val scale = graft.operators.LabelProp.SCALE
    val mid = graft.operators.LabelProp.MID
    val iterCtes = (1 to LP_ITERS).map { k =>
      s"""r$k AS (SELECT nd.node,
         |  CASE WHEN sd.seed IS NOT NULL THEN sd.seed
         |       WHEN c.s IS NOT NULL THEN c.s // dg.deg
         |       ELSE $mid END AS r
         |  FROM nodes nd
         |  LEFT JOIN seeds sd ON sd.node = nd.node
         |  LEFT JOIN (SELECT e.dst, sum(r.r) AS s
         |             FROM e JOIN r${k - 1} r ON r.node = e.src
         |             GROUP BY e.dst) c ON c.dst = nd.node
         |  LEFT JOIN deg dg ON dg.src = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (SELECT source || '/' || lang AS node,
       |    regexp_split_to_array(trim(lower(text)), '\\s+') AS wl
       |  FROM documents),
       |sh AS (SELECT node,
       |         CASE WHEN len(wl) >= 3 THEN
       |           list_transform(range(1, len(wl) - 1),
       |             i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])
       |         ELSE CAST([] AS VARCHAR[]) END AS s
       |       FROM w),
       |g0 AS (SELECT DISTINCT node, gram FROM
       |        (SELECT node, unnest(list_distinct(s)) AS gram FROM sh)),
       |g AS (SELECT node, gram FROM
       |        (SELECT node, gram,
       |           count(*) OVER (PARTITION BY gram) AS df FROM g0)
       |      WHERE df <= $LP_MAX_DF),
       |nodes AS (SELECT DISTINCT node FROM w),
       |e AS (SELECT a.node AS src, b.node AS dst
       |      FROM g a JOIN g b ON a.gram = b.gram AND a.node <> b.node
       |      GROUP BY 1, 2 HAVING count(*) >= $LP_MIN_SHARED),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |seeds AS (SELECT node,
       |    CASE WHEN node LIKE 'src0/%' THEN $scale ELSE 0 END AS seed
       |  FROM nodes WHERE node LIKE 'src0/%' OR node LIKE 'src1/%'),
       |r0 AS (SELECT nd.node, coalesce(sd.seed, $mid) AS r
       |       FROM nodes nd LEFT JOIN seeds sd ON sd.node = nd.node),
       |$iterCtes
       |SELECT node, CAST(r AS BIGINT) AS belief_e12,
       |  CAST(CASE WHEN r > $mid THEN 1 WHEN r < $mid THEN -1 ELSE 0 END
       |    AS INTEGER) AS side
       |FROM r$LP_ITERS""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_curate_e2e" -> curateOracle,
    "q_curate_rw" -> curateRwOracle,
    "q_pagerank" -> pagerankOracle,
    "q_label_prop" -> labelPropOracle,
    // the CMS bound is the claim under test on the Spark side
    // (q_approx_distinct technique); the oracle pins the exact top-15
    // and asserts within_bound as the constant 1
    "q_cms" ->
      """WITH t AS (SELECT unnest(regexp_split_to_array(trim(lower(text)),
        |             '\s+')) AS term
        |           FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term)
        |SELECT term, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(1 AS INTEGER) AS within_bound
        |FROM c ORDER BY cnt DESC, term ASC LIMIT 15""".stripMargin,
    "q_pipeline_e2e" ->
      s"""WITH m AS (
         |  SELECT doc_id, n_chars,
         |    regexp_split_to_array(trim(lower(text)), '\\s+') AS w
         |  FROM documents),
         |e AS (
         |  SELECT doc_id,
         |    CAST(len(w) AS BIGINT) AS wc,
         |    CAST(floor(CAST(n_chars AS DOUBLE) / len(w) * 10000) AS BIGINT) AS cpw_e4,
         |    CAST(floor(CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 10000)
         |         AS BIGINT) AS div_e4,
         |    md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS fp
         |  FROM m),
         |kept AS (
         |  SELECT * FROM e
         |  WHERE wc >= 30 AND wc <= 300 AND cpw_e4 <= 80000 AND div_e4 >= 3000),
         |surv AS (
         |  SELECT fp, CAST(min(doc_id) AS BIGINT) AS doc_id,
         |    CAST(min(wc) AS BIGINT) AS wc_min
         |  FROM kept GROUP BY fp)
         |SELECT $SHARD_SQL AS shard, count(*) AS n_docs,
         |  CAST(sum(wc_min) AS BIGINT) AS sum_wc
         |FROM surv GROUP BY 1""".stripMargin,
    "q_zorder" ->
      s"""WITH d AS (SELECT event_id, user_id % 256 AS ux,
         |             CAST(floor(value) AS BIGINT) AS vy
         |           FROM events),
         |z AS (SELECT event_id, ux, vy, $ZORDER_SQL AS z FROM d)
         |SELECT CAST(floor(z / 4096) AS BIGINT) AS zbucket, count(*) AS n,
         |  min(ux) AS min_ux, max(ux) AS max_ux,
         |  min(vy) AS min_vy, max(vy) AS max_vy
         |FROM z GROUP BY 1""".stripMargin,
    "q_shard" ->
      s"""WITH d AS (SELECT doc_id, $SHARD_SQL AS shard, $TOK_SQL AS n_tok
         |           FROM documents)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok
         |FROM d GROUP BY shard""".stripMargin,
    "q_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
        |      % 16 < 3""".stripMargin,
    // Efraimidis-Spirakis replay: same md5-uniform in (0,1], same
    // -ln(u)/w priority, k smallest with id-asc ties
    "q_weighted_sample" ->
      """WITH p AS (SELECT doc_id, n_chars,
        |    -ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)
        |         AS BIGINT) + 1) / 281474976710656.0)
        |      / CAST(n_chars AS DOUBLE) AS pr
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars FROM p
        |ORDER BY pr ASC, doc_id ASC LIMIT 200""".stripMargin,
    // stratified replay: the negated-log score TopK ranks by (round6
    // desc, id asc), per language-hash group
    "q_weighted_stratified" ->
      """WITH p AS (SELECT
        |    CAST('0x' || substring(md5(lang), 1, 12) AS BIGINT) AS lang_h,
        |    doc_id, n_chars,
        |    -ln(-ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)
        |         AS BIGINT) + 1) / 281474976710656.0)
        |      / CAST(n_chars AS DOUBLE)) AS s
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT lang_h, doc_id,
        |        row_number() OVER (PARTITION BY lang_h
        |          ORDER BY round(s, 6) DESC, doc_id ASC) AS rank
        |      FROM p)
        |SELECT lang_h, doc_id, rank FROM r WHERE rank <= 20""".stripMargin,
    "q_pack" ->
      s"""WITH d AS (SELECT doc_id, $SHARD_SQL AS shard, $TOK_SQL AS n_tok
         |           FROM documents)
         |SELECT doc_id, shard,
         |  CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_before,
         |  CAST(floor(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $BUDGET) AS BIGINT)
         |    AS pack_id
         |FROM d""".stripMargin,
    "q_length_buckets" ->
      s"""WITH d AS (SELECT $TOK_SQL AS n FROM documents),
         |b AS (SELECT CASE WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
         |        WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
         |        WHEN n <= 512 THEN 512 WHEN n <= 1024 THEN 1024
         |        ELSE 2048 END AS bucket,
         |        least(n, 2048) AS t FROM d)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(t) AS BIGINT) AS sum_tokens,
         |  CAST((sum(t) * 10000) // (count(*) * bucket) AS BIGINT)
         |    AS pad_eff_e4
         |FROM b GROUP BY bucket""".stripMargin,
    "q_temp_sample" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |r AS (SELECT lang,
        |        CAST(floor(least(1.0, 5.0 / sqrt(CAST(n AS DOUBLE)))
        |             * 1000000) AS BIGINT) AS rate_ppm
        |      FROM n)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 12)
        |        AS BIGINT) % 1000000 < r.rate_ppm""".stripMargin,

    "q_mix" -> {
      val cases = MIX_BP.toSeq.sortBy(_._1)
        .map { case (k, bp) => s"WHEN '$k' THEN $bp" }.mkString(" ")
      s"""SELECT doc_id, source FROM documents
         |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
         |      % 10000 < CASE source $cases ELSE 0 END""".stripMargin
    },
    // partitions on the SAME 48-bit md5 surrogate the operator keys
    // by, so even a surrogate collision stays engine-identical
    "q_quota" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST('0x' || substring(md5(source), 1, 12) AS BIGINT) AS k,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY k ORDER BY h ASC, doc_id ASC) AS rn
        |      FROM d)
        |SELECT doc_id, source FROM r WHERE rn <= 10""".stripMargin,

    // q_dsir replay: rebuild both hashed-bucket count tables, decide
    // each bucket's vote by the HUGEINT cross-multiplication (exact,
    // like the operator's BigInt; unsmoothed MLE — the operator's
    // documented sign rule), sum votes per document. tok is
    // MATERIALIZED — it feeds three consumers and would otherwise
    // inline into three full scans.
    "q_dsir" ->
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id,
         |    CAST(CAST('0x' || substring(md5(w), 1, 12) AS BIGINT) % $DSIR_B
         |      AS INTEGER) AS b
         |  FROM (SELECT doc_id,
         |          unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
         |        FROM documents)),
         |tc AS (SELECT b, count(*) AS n FROM tok WHERE doc_id % 7 = 0 GROUP BY 1),
         |rc AS (SELECT b, count(*) AS n FROM tok GROUP BY 1),
         |tot AS (SELECT
         |    (SELECT CAST(coalesce(sum(n), 0) AS HUGEINT) FROM tc) AS nt,
         |    (SELECT CAST(coalesce(sum(n), 0) AS HUGEINT) FROM rc) AS nr),
         |votes AS MATERIALIZED (
         |  SELECT rc.b,
         |    CASE WHEN CAST(coalesce(tc.n, 0) AS HUGEINT) * tot.nr
         |            > CAST(rc.n AS HUGEINT) * tot.nt THEN 1
         |         WHEN CAST(coalesce(tc.n, 0) AS HUGEINT) * tot.nr
         |            < CAST(rc.n AS HUGEINT) * tot.nt THEN -1
         |         ELSE 0 END AS v
         |  FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot)
         |SELECT tok.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(v) AS BIGINT) AS score,
         |  CAST(CASE WHEN sum(v) > 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM tok JOIN votes USING (b)
         |GROUP BY 1""".stripMargin,

    // q_token_mix replay: exact totals, HUGEINT floor-division ppm
    // rates (matching the operator's BigInt), md5-shard fractional
    // keep, range-expansion for whole epochs
    "q_token_mix" -> {
      val vals = TOKEN_BUDGETS.toSeq.sortBy(_._1)
        .map { case (k, b) => s"('$k', $b)" }.mkString(", ")
      s"""WITH b(source, budget) AS (VALUES $vals),
         |t AS (SELECT source, CAST(sum(n_chars) AS HUGEINT) AS tot
         |      FROM documents GROUP BY 1),
         |r AS (SELECT b.source,
         |        CAST(CAST(b.budget AS HUGEINT) * 1000000 // t.tot AS BIGINT)
         |          AS ppm
         |      FROM b JOIN t USING (source) WHERE t.tot > 0),
         |k AS (SELECT d.doc_id, d.source,
         |        r.ppm // 1000000
         |          + CASE WHEN CAST('0x' ||
         |                substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 12)
         |                AS BIGINT) % 1000000 < r.ppm % 1000000
         |              THEN 1 ELSE 0 END AS copies
         |      FROM documents d JOIN r USING (source))
         |SELECT doc_id, source,
         |  CAST(unnest(range(0, copies)) AS BIGINT) AS epoch
         |FROM k""".stripMargin
    },

    // q_quality_filter replay: the 2-epoch batch perceptron unrolls
    // into CTEs. Epoch 1 from zero weights misclassifies everything
    // (y*0 <= 0), so w1 = per-bucket sum of labels over ALL word
    // occurrences; epoch 2 gates the same sum on y*score_1 <= 0;
    // final scoring joins occurrences to w2. tok/w1/s1 feed multiple
    // consumers -> MATERIALIZED (inlining would rescan the parquet
    // per consumer).
    "q_quality_filter" ->
      s"""WITH $qualityScoreCtes
         |SELECT doc_id, n_words, score,
         |  CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM sc""".stripMargin,

    // q_nb_quality replay: the same (doc, label, bucket) projection
    // as the perceptron chain, then the closed-form NB weights —
    // exact BIGINT count products, ONE double division, ln, floor
    // (the LanguageModel micro-nat discipline) — and a per-doc
    // log-odds sum plus the smoothed log prior bias
    "q_nb_quality" ->
      s"""WITH $nbDocTokCtes,
         |${nbChainCtes("")}
         |SELECT d.doc_id, CAST(len(d.wl) AS BIGINT) AS n_words,
         |  CAST(bias.bias + coalesce(s.sw, 0) AS BIGINT) AS score_e6,
         |  CAST(CASE WHEN bias.bias + coalesce(s.sw, 0) > 0
         |       THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM d LEFT JOIN s USING (doc_id), bias""".stripMargin,

    // q_score_normalize replay: the same trained score chain, then
    // exact integer percent-rank windows within each source (rank
    // ties broken by doc_id, single-doc sources pin to 10000)
    "q_score_normalize" ->
      s"""WITH $qualityScoreCtes,
         |j AS (SELECT sc.doc_id, dd.source, sc.score
         |      FROM sc JOIN documents dd USING (doc_id)),
         |r AS (SELECT doc_id, source, score,
         |        CAST(row_number() OVER (PARTITION BY source
         |          ORDER BY score, doc_id) AS BIGINT) AS rk,
         |        CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |      FROM j)
         |SELECT doc_id, source, score,
         |  CAST(CASE WHEN n > 1 THEN (rk - 1) * 10000 // (n - 1)
         |       ELSE 10000 END AS BIGINT) AS pct_e4,
         |  CAST(CASE WHEN (CASE WHEN n > 1 THEN (rk - 1) * 10000 // (n - 1)
         |       ELSE 10000 END) >= $NORM_KEEP_E4 THEN 1 ELSE 0 END
         |    AS INTEGER) AS keep
         |FROM r""".stripMargin,

    // q_write_plan replay: exact octet-length sums, integer ceil
    // divisions, n_files clamped to >= 1 (both engines' greatest
    // skips NULLs, so an all-null group also plans one file)
    "q_write_plan" ->
      s"""WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(strlen(text)) AS BIGINT) AS est_bytes
         |  FROM documents GROUP BY source),
         |f AS (SELECT source, n_rows, est_bytes,
         |    greatest((est_bytes + ${WRITE_TARGET_BYTES - 1})
         |      // $WRITE_TARGET_BYTES, 1) AS n_files
         |  FROM a)
         |SELECT source, n_rows, est_bytes,
         |  CAST(n_files AS BIGINT) AS n_files,
         |  CAST((n_rows + n_files - 1) // n_files AS BIGINT) AS rows_per_file
         |FROM f""".stripMargin,

    // q_score_normalize_hist replay: per-source [min, max] spans,
    // equal-width buckets, cumulative strictly-below counts over the
    // bucket histogram, bucket-floor percentile — all operands
    // nonnegative, so `//` == `div`
    "q_score_normalize_hist" ->
      s"""WITH $qualityScoreCtes,
         |j AS (SELECT sc.doc_id, dd.source, sc.score
         |      FROM sc JOIN documents dd USING (doc_id)),
         |sp AS (SELECT source, CAST(min(score) AS BIGINT) AS lo,
         |         CAST(max(score) AS BIGINT) AS hi,
         |         CAST(count(*) AS BIGINT) AS n
         |       FROM j GROUP BY 1),
         |bk AS (SELECT j.doc_id, j.source, j.score, sp.n,
         |         CAST(((j.score - sp.lo) * $NORM_HIST_B)
         |           // (sp.hi - sp.lo + 1) AS INTEGER) AS b
         |       FROM j JOIN sp USING (source)),
         |h AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c
         |      FROM bk GROUP BY 1, 2),
         |bl AS (SELECT source, b,
         |         CAST(sum(c) OVER (PARTITION BY source ORDER BY b ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
         |           AS BIGINT) AS below
         |       FROM h)
         |SELECT bk.doc_id, bk.source, bk.score,
         |  CAST(CASE WHEN bk.n > 1 THEN bl.below * 10000 // (bk.n - 1)
         |       ELSE 10000 END AS BIGINT) AS pct_e4,
         |  CAST(CASE WHEN (CASE WHEN bk.n > 1
         |         THEN bl.below * 10000 // (bk.n - 1) ELSE 10000 END)
         |       >= $NORM_KEEP_E4 THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM bk JOIN bl ON bl.source = bk.source AND bl.b = bk.b
         |""".stripMargin,

    // q_quality_ensemble replay: the perceptron chain (shared d/tok
    // projections) plus the SAME NB chain helper under n-prefixed
    // CTE names (one definition — q_nb_quality and the ensemble's
    // vote_nb cannot drift), three integer votes, majority keep
    "q_quality_ensemble" ->
      s"""WITH $qualityScoreCtes,
         |${nbChainCtes("n")},
         |nsc AS (SELECT d.doc_id,
         |          CAST(CASE WHEN nbias.bias + coalesce(ns.sw, 0) > 0
         |               THEN 1 ELSE 0 END AS INTEGER) AS vote_nb
         |        FROM d LEFT JOIN ns USING (doc_id), nbias)
         |SELECT sc.doc_id,
         |  CAST(CASE WHEN sc.score > 0 THEN 1 ELSE 0 END AS INTEGER)
         |    AS vote_perc,
         |  nsc.vote_nb,
         |  CAST(CASE WHEN sc.n_words BETWEEN 30 AND 300 THEN 1 ELSE 0 END
         |    AS INTEGER) AS vote_len,
         |  CAST((CASE WHEN sc.score > 0 THEN 1 ELSE 0 END) + nsc.vote_nb +
         |    (CASE WHEN sc.n_words BETWEEN 30 AND 300 THEN 1 ELSE 0 END)
         |    AS INTEGER) AS votes,
         |  CAST(CASE WHEN (CASE WHEN sc.score > 0 THEN 1 ELSE 0 END) +
         |    nsc.vote_nb +
         |    (CASE WHEN sc.n_words BETWEEN 30 AND 300 THEN 1 ELSE 0 END) >= 2
         |    THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM sc JOIN nsc USING (doc_id)""".stripMargin,

    // q_threshold_sweep replay: the same perceptron-score chain, then
    // the retention curve = histogram over floor(score/5)*5 buckets +
    // a descending cumulative window + truncating e4 shares
    "q_threshold_sweep" ->
      s"""WITH $qualityScoreCtes,
         |h AS (SELECT CAST(floor(score / 5.0) AS BIGINT) * 5 AS threshold,
         |             CAST(count(*) AS BIGINT) AS d_,
         |             CAST(sum(n_words) AS BIGINT) AS w_
         |      FROM sc GROUP BY 1),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS td,
         |             CAST(sum(n_words) AS BIGINT) AS tw FROM sc),
         |c AS (SELECT threshold,
         |        CAST(sum(d_) OVER (ORDER BY threshold DESC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          AS BIGINT) AS docs_kept,
         |        CAST(sum(w_) OVER (ORDER BY threshold DESC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          AS BIGINT) AS weight_kept
         |      FROM h)
         |SELECT c.threshold, c.docs_kept, c.weight_kept,
         |  CAST(c.docs_kept * 10000 // t.td AS BIGINT) AS doc_share_e4,
         |  CAST(c.weight_kept * 10000 // t.tw AS BIGINT) AS weight_share_e4
         |FROM c, t""".stripMargin,

    // q_calibration replay: the same perceptron-score chain, then the
    // reliability agg — adaptive equal-width bins over the min/max
    // margin range, nonneg // for bin and rate, sign-split // for
    // the mean (truncation toward zero, matching Spark's div)
    "q_calibration" ->
      s"""WITH $qualityScoreCtes,
         |j AS (SELECT sc.score, d.y FROM sc JOIN d USING (doc_id)),
         |mm AS (SELECT CAST(min(score) AS BIGINT) AS mn,
         |              CAST(max(score) AS BIGINT) AS mx FROM j),
         |g AS (SELECT ((score - mm.mn) * 20) // (mm.mx - mm.mn + 1) AS bin,
         |        CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_pos,
         |        CAST(sum(score) AS BIGINT) AS sum_score,
         |        max(mm.mn) AS mn2, max(mm.mx) AS mx2
         |      FROM j, mm GROUP BY 1)
         |SELECT CAST(bin AS BIGINT) AS bin,
         |  CAST(mn2 + (bin * (mx2 - mn2 + 1)) // 20 AS BIGINT) AS bin_lo,
         |  n_docs, n_pos,
         |  CAST((n_pos * 10000) // n_docs AS BIGINT) AS pos_rate_e4,
         |  CAST(CASE WHEN sum_score >= 0 THEN (sum_score * 10000) // n_docs
         |       ELSE -(((-sum_score) * 10000) // n_docs) END AS BIGINT)
         |    AS mean_score_e4
         |FROM g""".stripMargin,

    // q_budget_waterfill replay: per-source token totals -> exact
    // integer sqrt weights -> the prefix-test waterfill over the
    // cap/weight-ascending order, fill rate in IEEE doubles with the
    // IDENTICAL expression shape as the Spark side
    "q_budget_waterfill" ->
      s"""WITH t0 AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS tokens
         |       FROM documents WHERE source IS NOT NULL
         |       GROUP BY 1 HAVING sum(n_chars) > 0),
         |b AS (SELECT source, tokens,
         |        CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS c0
         |      FROM t0),
         |w AS (SELECT source, tokens,
         |        CASE WHEN (c0+1)*(c0+1) <= tokens THEN c0+1
         |             WHEN c0*c0 > tokens THEN c0-1 ELSE c0 END AS wt,
         |        CAST($WF_EPOCHS AS BIGINT) * tokens AS cap
         |      FROM b),
         |o AS (SELECT *,
         |        coalesce(CAST(sum(cap) OVER (ORDER BY
         |          CAST(cap AS DOUBLE) / CAST(wt AS DOUBLE) ASC, source ASC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |          AS BIGINT), 0) AS prefix_c,
         |        CAST(sum(wt) OVER (ORDER BY
         |          CAST(cap AS DOUBLE) / CAST(wt AS DOUBLE) ASC, source ASC
         |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |          AS BIGINT) AS suf_w
         |      FROM w),
         |s AS (SELECT *,
         |        CASE WHEN CAST(cap AS DOUBLE) * CAST(suf_w AS DOUBLE)
         |          <= CAST($WF_BUDGET - prefix_c AS DOUBLE) * CAST(wt AS DOUBLE)
         |          THEN 1 ELSE 0 END AS test_
         |      FROM o),
         |g AS (SELECT *,
         |        CAST(min(test_) OVER (ORDER BY
         |          CAST(cap AS DOUBLE) / CAST(wt AS DOUBLE) ASC, source ASC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          AS BIGINT) = 1 AS capped
         |      FROM s),
         |f AS (SELECT *,
         |        coalesce(CAST(sum(CASE WHEN capped THEN cap END) OVER ()
         |          AS BIGINT), 0) AS capped_c,
         |        coalesce(CAST(sum(CASE WHEN NOT capped THEN wt END) OVER ()
         |          AS BIGINT), 0) AS unc_w
         |      FROM g)
         |SELECT source, tokens, cap, capped,
         |  CAST(CASE WHEN capped THEN cap
         |    ELSE CAST(floor(CAST($WF_BUDGET - capped_c AS DOUBLE)
         |      / CAST(unc_w AS DOUBLE) * CAST(wt AS DOUBLE)) AS BIGINT)
         |    END AS BIGINT) AS alloc_tokens,
         |  CAST((CASE WHEN capped THEN cap
         |    ELSE CAST(floor(CAST($WF_BUDGET - capped_c AS DOUBLE)
         |      / CAST(unc_w AS DOUBLE) * CAST(wt AS DOUBLE)) AS BIGINT)
         |    END) * 10000 // tokens AS BIGINT) AS epochs_e4
         |FROM f""".stripMargin
  )

  // the shared perceptron-score chain (q_quality_filter and
  /** The (doc, label, word-bucket) projection CTEs the NB oracle
    * chains over — textually the same `d`/`tok` shape as
    * [[qualityScoreCtes]] (which additionally carries the perceptron
    * chain; q_nb_quality alone doesn't want those materialized). */
  private lazy val nbDocTokCtes: String =
    s"""d AS MATERIALIZED (SELECT doc_id,
       |       CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |       regexp_split_to_array(trim(lower(text)), '\\s+') AS wl
       |     FROM documents),
       |tok AS MATERIALIZED (
       |  SELECT doc_id, y,
       |    CAST(CAST('0x' || substring(md5(w), 1, 12) AS BIGINT) % $QUAL_B
       |      AS INTEGER) AS b
       |  FROM (SELECT doc_id, y, unnest(wl) AS w FROM d))""".stripMargin

  /** The closed-form NB chain over existing `d`/`tok` CTEs, with
    * every CTE name prefixed by `p` so it can coexist with the
    * perceptron chain in one WITH list — ONE definition of the
    * micro-nat arithmetic shared by q_nb_quality and the ensemble's
    * vote_nb (a one-sided smoothing edit cannot make them silently
    * disagree). No trailing comma. */
  private def nbChainCtes(p: String): String =
    s"""${p}cnt AS MATERIALIZED (
       |  SELECT b,
       |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |    CAST(sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS cn
       |  FROM tok GROUP BY 1),
       |${p}tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
       |                CAST(sum(cn) AS BIGINT) AS nn FROM ${p}cnt),
       |${p}w AS MATERIALIZED (
       |  SELECT b, CAST(floor(1000000 * ln(
       |      CAST((cp + 1) * (nn + $QUAL_B) AS DOUBLE) /
       |      CAST((cn + 1) * (np + $QUAL_B) AS DOUBLE))) AS BIGINT) AS w
       |  FROM ${p}cnt, ${p}tot),
       |${p}dc AS (SELECT
       |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dp,
       |    CAST(sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS dn
       |  FROM d),
       |${p}bias AS (SELECT CAST(floor(1000000 * ln(
       |    CAST(dp + 1 AS DOUBLE) / CAST(dn + 1 AS DOUBLE))) AS BIGINT)
       |    AS bias FROM ${p}dc),
       |${p}s AS (SELECT t.doc_id, CAST(sum(${p}w.w) AS BIGINT) AS sw
       |      FROM tok t JOIN ${p}w USING (b) GROUP BY 1)""".stripMargin

  // q_threshold_sweep replay the same trained model; the whole
  // 2-epoch train loop unrolls into CTEs). Epoch 1 from zero weights
  // misclassifies everything (y*0 <= 0), so w1 = per-bucket sum of
  // labels over ALL word occurrences; epoch 2 gates the same sum on
  // y*score_1 <= 0; final scoring joins occurrences to w2.
  // tok/w1/s1 feed multiple consumers -> MATERIALIZED (inlining
  // would rescan the parquet per consumer). `sc` = one row per doc:
  // (doc_id, n_words, score).
  private lazy val qualityScoreCtes: String =
    s"""d AS MATERIALIZED (SELECT doc_id,
       |       CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |       regexp_split_to_array(trim(lower(text)), '\\s+') AS wl
       |     FROM documents),
       |tok AS MATERIALIZED (
       |  SELECT doc_id, y,
       |    CAST(CAST('0x' || substring(md5(w), 1, 12) AS BIGINT) % $QUAL_B
       |      AS INTEGER) AS b
       |  FROM (SELECT doc_id, y, unnest(wl) AS w FROM d)),
       |w1 AS MATERIALIZED (
       |  SELECT b, CAST(sum(y) AS BIGINT) AS w FROM tok GROUP BY 1),
       |s1 AS MATERIALIZED (
       |  SELECT t.doc_id, CAST(sum(w1.w) AS BIGINT) AS s
       |  FROM tok t JOIN w1 USING (b) GROUP BY 1),
       |d2 AS (SELECT t.b, CAST(sum(t.y) AS BIGINT) AS dw
       |       FROM tok t JOIN s1 USING (doc_id)
       |       WHERE t.y * s1.s <= 0 GROUP BY 1),
       |w2 AS MATERIALIZED (
       |  SELECT w1.b, w1.w + coalesce(d2.dw, 0) AS w
       |  FROM w1 LEFT JOIN d2 USING (b)),
       |s2 AS (SELECT t.doc_id, CAST(sum(w2.w) AS BIGINT) AS s
       |       FROM tok t JOIN w2 USING (b) GROUP BY 1),
       |sc AS MATERIALIZED (SELECT d.doc_id,
       |       CAST(len(d.wl) AS BIGINT) AS n_words,
       |       CAST(coalesce(s2.s, 0) AS BIGINT) AS score
       |     FROM d LEFT JOIN s2 USING (doc_id))""".stripMargin
}
