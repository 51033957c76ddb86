package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity filtering — the CCNet recipe
  * (Wenzek et al. 2020): score every document against a language
  * model trained on a trusted reference corpus and keep the
  * low-perplexity (reference-like) documents. CCNet uses a pruned
  * KenLM 5-gram; this is the same signal as a bigram model with
  * stupid backoff (Brants et al. 2007 — no normalization, a fixed
  * 0.4 backoff factor), which needs no smoothing machinery and
  * replays exactly in SQL.
  *
  * Engine-portable scoring: probabilities are ratios of integer
  * counts evaluated in double precision with one fixed association,
  * each token's cost is floored to integer micro-nats BEFORE the
  * per-document sum (no float-accumulation-order dependence), and
  * the per-document average is integer division. Same discipline as
  * BM25's micro-unit scores ([[Retrieval]]).
  *
  * Scale shape: training is two map-combined aggregations over the
  * reference (bigram and unigram counts — posting-scale exchanges on
  * the gram key, reference-sized, and the reference is a curated
  * sample orders of magnitude smaller than the corpus). Scoring
  * explodes each document into (prev, cur) pairs and equi-joins the
  * count tables on the gram keys — the corpus never shuffles on
  * anything wider than a token pair, and the count tables broadcast
  * when pruned to memory size (the KenLM deployment shape; AQE picks
  * broadcast automatically under the threshold). One aggregation on
  * the doc id finishes. No driver materialization anywhere.
  */
object LanguageModel {

  import graft.functions.TextFunctions.words

  /** Per-document bigram NLL against a stupid-backoff model trained
    * on `ref`: positions 2..n score -ln of
    *   c(prev,cur)/c(prev)            when the bigram was seen,
    *   0.4 * c(cur)/total             when only the word was seen,
    *   0.4 / (total * 10)             for unknown words.
    * Documents with fewer than 2 words drop out (no scored
    * positions — the shingle dropout rule).
    *
    * @return (idCol, n_scored, nll_e6, avg_nll_e6) — micro-nat
    *         totals; filter on avg_nll_e6 for the CCNet keep/drop. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                ref: DataFrame, refTextCol: String): DataFrame =
    bigramNllOfWords(
      docs.select(col(idCol), words(col(textCol)).as("__gpw")),
      idCol, "__gpw",
      ref.select(words(col(refTextCol)).as("__gpw")), "__gpw")

  /** [[bigramNll]] over already-projected word-array columns —
    * composed pipelines tokenize once (regex/HOF expressions have no
    * CSE). */
  def bigramNllOfWords(docs: DataFrame, idCol: String, wordsCol: String,
                       ref: DataFrame, refWordsCol: String): DataFrame = {
    val refToks = ref.select(col(refWordsCol).as("__w"))
    val uni = refToks.select(explode(col("__w")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val big = refToks.select(explode(pairsOf(col("__w"))).as("p"))
      .select(col("p.prev").as("prev"), col("p.cur").as("cur"))
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c12"))
    // an EMPTY reference would make total NULL, every cost NULL, and
    // a downstream threshold filter silently drop the whole corpus —
    // fail loudly instead (runtime check: the emptiness isn't known
    // until the plan executes)
    val total = refToks
      .agg(sum(size(col("__w"))).cast("long").as("__t"))
      .select(when(col("__t").isNull, raise_error(lit(
        "bigramNll: empty reference corpus (every backoff " +
          "probability would divide by zero)")).cast("long"))
        .otherwise(col("__t")).as("total"))

    val pairs = docs
      .select(col(idCol).as("id"), col(wordsCol).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col("id"), explode(pairsOf(col("__w"))).as("p"))
      .select(col("id"), col("p.prev").as("prev"), col("p.cur").as("cur"))

    val scored = pairs
      .join(big, Seq("prev", "cur"), "left")
      .join(uni.select(col("w").as("prev"), col("c").as("c1")),
        Seq("prev"), "left")
      .join(uni.select(col("w").as("cur"), col("c").as("c2")),
        Seq("cur"), "left")
      .crossJoin(broadcast(total))
      .withColumn("cost_e6", floor(lit(1000000.0) * -log(
        when(col("c12").isNotNull,
          col("c12").cast("double") / col("c1").cast("double"))
        .otherwise(when(col("c2").isNotNull,
          lit(0.4) * (col("c2").cast("double") / col("total").cast("double")))
        .otherwise(lit(0.4) / (col("total").cast("double") * lit(10.0)))))))

    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_scored"), sum(col("cost_e6")).as("nll_e6"))
      .select(col("id").as(idCol), col("n_scored"), col("nll_e6"),
        expr("nll_e6 div n_scored").as("avg_nll_e6"))
  }

  /** (prev, cur) struct pairs of consecutive words — the scored
    * positions 2..n as one narrow array expression. */
  private def pairsOf(w: org.apache.spark.sql.Column) =
    zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
      (a, b) => struct(a.as("prev"), b.as("cur")))

  /** (p2, p1, cur) struct triples of consecutive words — positions
    * 3..n. */
  private def triplesOf(w: org.apache.spark.sql.Column) =
    zip_with(
      zip_with(slice(w, lit(1), size(w) - 2), slice(w, lit(2), size(w) - 2),
        (a, b) => struct(a.as("p2"), b.as("p1"))),
      slice(w, lit(3), size(w) - 2),
      (ab, c) => struct(ab("p2").as("p2"), ab("p1").as("p1"), c.as("cur")))

  /** Per-document TRIGRAM NLL with full stupid backoff (Brants et
    * al. 2007 — the order CCNet's production KenLM actually runs at
    * is 5; order 3 exercises the recursive-backoff machinery the
    * bigram form cannot). Positions 3..n score −ln of
    *   c(p2 p1 cur)/c(p2 p1)        when the trigram was seen,
    *   0.4 · c(p1 cur)/c(p1)        backing off to the bigram,
    *   0.4² · c(cur)/total          backing off to the unigram,
    *   0.4² / (total · 10)          for unknown words
    * — each backoff level multiplying the fixed 0.4 penalty, exactly
    * the recursion S(w|ctx) = count ratio, else 0.4·S(w|shorter ctx).
    * Documents with fewer than 3 words drop out.
    *
    * Scale shape identical to [[bigramNll]]: gram-key left joins
    * against reference count tables (the corpus text itself never
    * shuffles — only exploded gram rows), one broadcast total, one
    * map-combined per-doc aggregation. The count tables grow with
    * the reference (trigram vocabulary ~cubes the tail), which is
    * why production ships PRUNED models — the broadcast-narrow twin
    * of this form follows [[ngramNllNarrow]] with the same
    * min-count discipline.
    * @return (idCol, n_scored, nll_e6, avg_nll_e6) */
  def trigramNll(docs: DataFrame, idCol: String, textCol: String,
                 ref: DataFrame, refTextCol: String): DataFrame = {
    val refToks = ref.select(words(col(refTextCol)).as("__w"))
    val uni = refToks.select(explode(col("__w")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val big = refToks.select(explode(pairsOf(col("__w"))).as("p"))
      .select(col("p.prev").as("prev"), col("p.cur").as("cur"))
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c12"))
    // the length guard is load-bearing, not cosmetic: triplesOf
    // slices with length size-2, and a one-word ref doc (words('')
    // is a 1-element array) makes that length NEGATIVE — Spark
    // rejects negative slice lengths at runtime. pairsOf survives
    // the same input (size-1 -> length 0), which is why the bigram
    // form never needed this.
    val tri = refToks.filter(size(col("__w")) >= 3)
      .select(explode(triplesOf(col("__w"))).as("t"))
      .select(col("t.p2").as("p2"), col("t.p1").as("p1"), col("t.cur").as("cur"))
      .groupBy(col("p2"), col("p1"), col("cur")).agg(count(lit(1)).as("c123"))
    val total = refToks
      .agg(sum(size(col("__w"))).cast("long").as("__t"))
      .select(when(col("__t").isNull, raise_error(lit(
        "trigramNll: empty reference corpus (every backoff " +
          "probability would divide by zero)")).cast("long"))
        .otherwise(col("__t")).as("total"))

    val triples = docs
      .select(col(idCol).as("id"), words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("id"), explode(triplesOf(col("__w"))).as("t"))
      .select(col("id"), col("t.p2").as("p2"), col("t.p1").as("p1"),
        col("t.cur").as("cur"))

    // a seen trigram guarantees its (p2, p1) context count exists,
    // so the first branch never divides by null
    val scored = triples
      .join(tri, Seq("p2", "p1", "cur"), "left")
      .join(big.select(col("prev").as("p2"), col("cur").as("p1"),
        col("c12").as("cctx")), Seq("p2", "p1"), "left")
      .join(big.select(col("prev").as("p1"), col("cur"),
        col("c12").as("c12b")), Seq("p1", "cur"), "left")
      .join(uni.select(col("w").as("p1"), col("c").as("c1")),
        Seq("p1"), "left")
      .join(uni.select(col("w").as("cur"), col("c").as("c2")),
        Seq("cur"), "left")
      .crossJoin(broadcast(total))
      .withColumn("cost_e6", floor(lit(1000000.0) * -log(
        when(col("c123").isNotNull,
          col("c123").cast("double") / col("cctx").cast("double"))
        .otherwise(when(col("c12b").isNotNull,
          lit(0.4) * (col("c12b").cast("double") / col("c1").cast("double")))
        .otherwise(when(col("c2").isNotNull,
          lit(0.16) * (col("c2").cast("double") / col("total").cast("double")))
        .otherwise(lit(0.16) / (col("total").cast("double") * lit(10.0))))))))

    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_scored"), sum(col("cost_e6")).as("nll_e6"))
      .select(col("id").as(idCol), col("n_scored"), col("nll_e6"),
        expr("nll_e6 div n_scored").as("avg_nll_e6"))
  }

  /** A trained order-N stupid-backoff model held in memory — the
    * deployment shape of KenLM-style filtering: CCNet ships a PRUNED
    * model to every worker and scores with lookups, never a join.
    * `tables(k-1)` holds the k-gram counts (space-joined keys —
    * unambiguous, words contain no whitespace by construction of the
    * tokenizer); `total` is the exact unpruned token count (the
    * backoff denominator). ONE type for every order — the old
    * Bigram/Trigram/FourgramModel triplication differed only in
    * order, and extending the ladder meant copying the scorer. */
  final case class NgramModel(order: Int,
                              tables: IndexedSeq[Map[String, Long]],
                              total: Long) {
    require(order >= 2 && tables.length == order,
      s"NgramModel: need tables for orders 1..$order, got ${tables.length}")
  }

  /** Max supported order (the scoring kernel's literal multiplier
    * table bounds it — [[graft.plans.NgramNll.BackoffMult]], the one
    * place the 0.4^k decimal literals live). */
  val MaxOrder: Int = graft.plans.NgramNll.BackoffMult.length - 1

  /** The shared KenLM-style pruned n-gram count-table builder: one
    * map-combined count per gram key, count floor + frequency-desc
    * top-M cap (lexicographic tiebreak for determinism) applied
    * EXECUTOR-side so the driver only ever receives the survivors.
    * Both trainers (and any higher-order variant) route through this
    * one builder — the prune discipline must not fork per order. */
  private def prunedCounts(grams: DataFrame, minCount: Long,
                           maxEntries: Int): Map[String, Long] = {
    val counts = grams.groupBy(col("k")).agg(count(lit(1)).as("c"))
    val floored = if (minCount > 1) counts.filter(col("c") >= minCount)
                  else counts
    val capped = if (maxEntries == Int.MaxValue) floored
                 else floored.orderBy(col("c").desc, col("k").asc)
                   .limit(maxEntries)
    capped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Collect 1..order gram reference counts into an [[NgramModel]],
    * pruned KenLM-style BEFORE the driver collect — the discipline
    * the deployment shape requires: an unpruned reference vocabulary
    * is bounded only by the corpus, and CCNet's production models
    * ship pruned (KenLM `--prune`). Two knobs, applied per count
    * table on the executors so the driver only ever receives the
    * survivors:
    *
    *  - `minCount`: drop grams seen fewer times (count floor);
    *  - `maxEntries`: keep the most frequent M per table
    *    (TakeOrdered — bounded driver memory even against an
    *    adversarial reference), count-desc with a lexicographic
    *    tiebreak for determinism.
    *
    * `total` stays the EXACT unpruned token count (one narrow scan):
    * pruning must not shrink the backoff denominator, or every
    * unknown-word cost would drift with the prune level. Lower-order
    * consistency cascades up the ladder: a surviving k-gram needs
    * its (k-1)-word CONTEXT in the (already-filtered) table below —
    * the seen-k-gram path divides by that context count; a k-gram
    * whose context was pruned scores through the backoff path,
    * exactly how a pruned KenLM degrades.
    *
    * Defaults (1, MaxValue) reproduce the unpruned model bit-for-bit.
    * order 5 is CCNet/KenLM's production recipe; orders 2-4 are the
    * cheaper rungs of the same ladder. */
  def trainNgrams(ref: DataFrame, refTextCol: String, order: Int,
                  minCount: Long = 1L,
                  maxEntries: Int = Int.MaxValue): NgramModel = {
    require(order >= 2 && order <= MaxOrder,
      s"trainNgrams: order must be in [2, $MaxOrder], got $order")
    val toks = ref.select(words(col(refTextCol)).as("__w"))
    def gramCounts(n: Int) = prunedCounts(
      if (n == 1) toks.select(explode(col("__w")).as("k"))
      else toks.select(explode(graft.functions.TextFunctions
        .shinglesOfWords(col("__w"), n)).as("k")), minCount, maxEntries)
    val tables = new Array[Map[String, Long]](order)
    tables(0) = gramCounts(1)
    var k = 2
    while (k <= order) {
      tables(k - 1) = gramCounts(k).filter { case (key, _) =>
        tables(k - 2).contains(key.substring(0, key.lastIndexOf(' '))) }
      k += 1
    }
    // exact UNpruned token total — the backoff denominator is corpus
    // mass, not surviving-entry mass. Unpruned, the unigram map IS
    // the full count table, so its sum is the total and the extra
    // corpus scan (re-tokenize + agg, the most expensive job here)
    // is pure waste; only a pruning run pays for it.
    val unpruned = minCount <= 1L && maxEntries == Int.MaxValue
    val total =
      if (unpruned) tables(0).valuesIterator.sum
      else toks.agg(coalesce(sum(size(col("__w"))), lit(0L))
        .cast("long").as("t")).head().getLong(0)
    require(total > 0,
      "trainNgrams: empty reference corpus (every backoff probability " +
        "would divide by zero)")
    NgramModel(order,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(tables), total)
  }

  // THE stupid-backoff recursion lives in graft.plans.NgramNll (one
  // recursion in source, shared by the summing and cost-array
  // scorers, interpreted and codegen'd paths alike). Model identity
  // for plan reuse: the expression embeds an LmModelRef whose
  // equality is a content digest, so two INDEPENDENTLY TRAINED equal
  // models produce sameResult plans (the PersistSlots reuse
  // ccnetBuckets depends on) — strictly stronger than the per-model
  // ScalaUDF cache this replaced, which only achieved identity reuse
  // for the same model instance.
  private def modelRef(model: NgramModel): graft.plans.LmModelRef =
    new graft.plans.LmModelRef(model.order, model.total, model.tables)

  /** Order-N NLL against an in-memory [[NgramModel]]: the
    * broadcast-narrow deployment form — per-token costs from map
    * lookups folded inside the row (O(1) per token, the ADC-LUT
    * pattern), zero exchanges and zero joins on the corpus side, so
    * it runs shuffle-free on a 100 TB scan AND unchanged on a stream
    * (no stateful aggregation anywhere; see the streaming↔batch
    * equivalence spec). The stupid-backoff recursion S(w|ctx) =
    * count ratio, else 0.4·S(w|shorter ctx) unrolled once for ALL
    * orders: level k scores MULT(N-k) · c(gram_k)/c(ctx_{k-1}),
    * the unigram level MULT(N-1) · c(cur)/total, unknown
    * MULT(N-1)/(total·10) — multipliers from the literal table so
    * orders 2-4 reproduce the old per-order scorers byte-for-byte
    * (1.0·x == x in IEEE; re-validated against the unchanged
    * oracles). The scorer is a codegen'd Catalyst expression over
    * java HashMaps ([[graft.plans.NgramNllSum]] — replaced the
    * per-row ScalaUDF in round 13; same arithmetic, whole-stage
    * codegen preserved). NOT typedLit map literals: element_at on
    * a Catalyst literal map is a LINEAR key scan (the old literal
    * form measured 84 s at sf0.1).
    * @return (idCol, n_scored, nll_e6, avg_nll_e6) — positions
    *         order..n score; docs under `order` words drop out. */
  def ngramNllNarrow(docs: DataFrame, idCol: String, textCol: String,
                     model: NgramModel): DataFrame =
    ngramNllNarrowOfWords(
      docs.select(col(idCol), words(col(textCol)).as("__gpw")),
      idCol, "__gpw", model)

  /** [[ngramNllNarrow]] over an already-projected word-array column
    * (transform lambdas must read an attribute, not an inline split —
    * see TextFunctions.shinglesOfWords). */
  def ngramNllNarrowOfWords(docs: DataFrame, idCol: String,
                            wordsCol: String,
                            model: NgramModel): DataFrame = {
    val order = model.order
    val ref = modelRef(model)
    docs
      // the <order-words dropout filters on the CHEAP word-array
      // size BEFORE the score expression exists
      .select(col(idCol), col(wordsCol).as("__gpnw"))
      .filter(size(col("__gpnw")) >= order)
      .select(col(idCol),
        (size(col("__gpnw")) - (order - 1)).cast("long").as("n_scored"),
        graft.plans.LmExpressions.nllSum(col("__gpnw"), ref).as("nll_e6"))
      .withColumn("avg_nll_e6", expr("nll_e6 div n_scored"))
  }

  /** Min-K% prob membership / contamination signal (Shi et al. 2023,
    * "Detecting Pretraining Data from Large Language Models"): the
    * mean NLL of a document's k% COSTLIEST (lowest-probability)
    * tokens. A document the reference model has effectively
    * memorized has few surprising tokens, so this tail statistic
    * separates seen-from-unseen material far better than the
    * full-document mean (which fluent filler washes out) — the
    * standard pretraining-data membership test, and a sharper
    * benchmark-contamination screen than gram overlap when the
    * leaked text was lightly edited.
    *
    * Per-token costs come from the SAME broadcast-model
    * stupid-backoff fold as [[ngramNllNarrow]]
    * ([[graft.plans.NgramNll]] — one recursion in source, codegen'd);
    * the selection is a per-document
    * order statistic computed entirely in-row (sort the cost array
    * descending, mean the first max(1, n·k/100) on the integer
    * micro-nat grid) — zero exchanges, zero joins, stream-safe,
    * and exactly replayable in SQL as a windowed rank over
    * per-token cost rows.
    * @return (idCol, n_scored, k_used, min_k_avg_nll_e6) */
  def minKProbNll(docs: DataFrame, idCol: String, textCol: String,
                  model: NgramModel, kPct: Int = 20): DataFrame = {
    require(kPct >= 1 && kPct <= 100,
      s"minKProbNll: kPct must be in [1, 100], got $kPct")
    val order = model.order
    val ref = modelRef(model)
    docs
      .select(col(idCol), words(col(textCol)).as("__mkw"))
      .filter(size(col("__mkw")) >= order)
      .select(col(idCol),
        graft.plans.LmExpressions.nllCosts(col("__mkw"), ref).as("__mkc"))
      .select(col(idCol),
        size(col("__mkc")).cast("long").as("n_scored"),
        greatest(lit(1L),
          expr(s"(size(__mkc) * $kPct) div 100").cast("long")).as("k_used"),
        col("__mkc"))
      .select(col(idCol), col("n_scored"), col("k_used"),
        expr("aggregate(slice(sort_array(__mkc, false), 1, int(k_used)), " +
          "0L, (a, x) -> a + x) div k_used").as("min_k_avg_nll_e6"))
  }

  /** CCNet's head/middle/tail corpus partition (Wenzek et al. 2020,
    * §4.3): score every document's average NLL against the reference
    * LM, then split the corpus at the NLL TERCILES — "head" is the
    * lowest-perplexity (most reference-like) third the high-quality
    * mix samples from, "tail" the noisiest. The published recipe
    * keeps the split as a labeled column rather than a filter so
    * downstream mixing can weight the buckets (e.g. head 70 / middle
    * 25 / tail 5).
    *
    * Thresholds are exact ORDER STATISTICS, not interpolated
    * percentiles: t1 = the smallest avg-NLL v with
    * |{docs: avg <= v}| * 3 >= n (and t2 likewise at 2n) — pure
    * integer comparisons on the micro-nat grid, so the bucket
    * assignment replays bit-identically in SQL (interpolated
    * percentiles differ in association across engines; order
    * statistics cannot).
    *
    * Scale shape: scoring is the narrow broadcast-model pass
    * ([[ngramNllNarrow]], zero exchanges); the tercile computation
    * runs on the VALUE HISTOGRAM (one map-combined count per
    * distinct micro-nat average — the exact-quantile-via-histogram
    * tradeoff q_histogram already takes; its global cumulative
    * window orders distinct values, not documents); thresholds ride
    * back as a one-row broadcast. The corpus itself is touched by
    * exactly one scan plus one narrow CASE projection.
    *
    * @return (idCol, avg_nll_e6, bucket) for every scored doc */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   model: NgramModel): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = ngramNllNarrow(docs, idCol, textCol, model)
      .select(col(idCol), col("avg_nll_e6"))
    val s = PersistSlots.swap("lm.ccnetScored", scored)
    // constant-key partition: the cumulative window runs over the
    // value histogram (bounded by distinct micro-nat averages, not
    // docs) — one partition is the point, but an UNPARTITIONED spec
    // trips the WindowExec warning that pattern-matches a
    // scale-killer. The key must be non-foldable (Catalyst strips a
    // literal partition spec): value * 0 survives as a real key
    val hist = s.groupBy(col("avg_nll_e6")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c"))
        .over(Window.partitionBy(col("avg_nll_e6") * 0)
          .orderBy(col("avg_nll_e6"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = s.agg(count(lit(1)).as("__n"))
    val thresholds = hist.crossJoin(broadcast(n)).agg(
      min(when(col("__cum") * 3 >= col("__n"), col("avg_nll_e6"))).as("__t1"),
      min(when(col("__cum") * 3 >= col("__n") * 2, col("avg_nll_e6"))).as("__t2"))
    s.crossJoin(broadcast(thresholds))
      .select(col(idCol), col("avg_nll_e6"),
        when(col("avg_nll_e6") <= col("__t1"), "head")
          .when(col("avg_nll_e6") <= col("__t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Per-document EXCESS LOSS — the learnability data-selection
    * signal (Mindermann et al. 2022 "RHO loss"; Lin et al. 2024
    * RHO-1 applies it to LM pretraining token selection), restated
    * for the n-gram proxy models this engine scores with: every
    * document gets TWO stupid-backoff bigram NLLs — one from a model
    * trained on the trusted REFERENCE corpus, one from a model
    * trained on the (much larger) training corpus itself — and
    *   excess_e6 = avg_train_nll − avg_ref_nll.
    * Positive excess marks text the reference model finds easy but
    * the corpus model finds hard: learnable and not yet learned —
    * the highest-value data to keep. Negative excess marks text the
    * corpus already models well (redundant) or the reference rejects
    * (noise). `selected` = excess > 0.
    *
    * Integer-exact like [[bigramNll]]: both per-token costs floor to
    * micro-nats before the sums, averages are integer division, and
    * the excess is a subtraction of two integers — replays exactly
    * in SQL.
    *
    * Scale shape: the corpus explodes into (prev, cur) pairs ONCE
    * and left-joins BOTH models' count tables in the same pass (six
    * gram-key joins against reference/vocabulary-sized tables —
    * broadcastable at pruned-model sizes; the corpus text never
    * shuffles twice), then one map-combined per-doc aggregation
    * produces both sums. BOTH words projections are slot-persisted:
    * the corpus side feeds the pairs explode AND the train-model
    * counts, and the reference side feeds its model's unigram,
    * bigram, and total aggregations (four consumers — unpersisted it
    * would re-read and re-tokenize the reference per subtree).
    *
    * @return (idCol, n_scored, train_nll_e6, ref_nll_e6, excess_e6,
    *         selected) — docs with fewer than 2 words drop out. */
  def excessLoss(docs: DataFrame, idCol: String, textCol: String,
                 ref: DataFrame, refTextCol: String): DataFrame = {
    val w = PersistSlots.swap("lm.excessLoss.words",
      docs.select(col(idCol).as("id"), words(col(textCol)).as("__w")))

    def uniOf(toks: DataFrame) = toks.select(explode(col("__w")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    def bigOf(toks: DataFrame) = toks
      .select(explode(pairsOf(col("__w"))).as("p"))
      .select(col("p.prev").as("prev"), col("p.cur").as("cur"))
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c12"))
    def totOf(toks: DataFrame, side: String) = toks
      .agg(sum(size(col("__w"))).cast("long").as("__t"))
      .select(when(col("__t").isNull, raise_error(lit(
        s"excessLoss: empty $side corpus (every backoff " +
          "probability would divide by zero)")).cast("long"))
        .otherwise(col("__t")).as(s"total_$side"))

    val refToks = PersistSlots.swap("lm.excessLoss.refWords",
      ref.select(words(col(refTextCol)).as("__w")))
    val trainToks = w.select(col("__w"))

    def renamed(df: DataFrame, side: String): DataFrame =
      df.columns.foldLeft(df) { (d, c) =>
        if (c == "prev" || c == "cur" || c == "w") d
        else d.withColumnRenamed(c, s"${c}_$side") }

    val pairs = w
      .filter(size(col("__w")) >= 2)
      .select(col("id"), explode(pairsOf(col("__w"))).as("p"))
      .select(col("id"), col("p.prev").as("prev"), col("p.cur").as("cur"))

    def cost(side: String) = floor(lit(1000000.0) * -log(
      when(col(s"c12_$side").isNotNull,
        col(s"c12_$side").cast("double") / col(s"c1_$side").cast("double"))
      .otherwise(when(col(s"c2_$side").isNotNull,
        lit(0.4) * (col(s"c2_$side").cast("double") /
          col(s"total_$side").cast("double")))
      .otherwise(lit(0.4) /
        (col(s"total_$side").cast("double") * lit(10.0))))))

    val scored = Seq("ref" -> refToks, "tr" -> trainToks)
      .foldLeft(pairs) { case (acc, (side, toks)) =>
        // one unigram aggregation per side serves both the c1 (prev)
        // and c2 (cur) joins
        val uni = renamed(uniOf(toks), side)
        acc
          .join(renamed(bigOf(toks), side), Seq("prev", "cur"), "left")
          .join(uni
            .select(col("w").as("prev"), col(s"c_$side").as(s"c1_$side")),
            Seq("prev"), "left")
          .join(uni
            .select(col("w").as("cur"), col(s"c_$side").as(s"c2_$side")),
            Seq("cur"), "left")
          .crossJoin(broadcast(totOf(toks, side)))
      }
      .withColumn("cost_ref_e6", cost("ref"))
      .withColumn("cost_tr_e6", cost("tr"))

    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_scored"),
        sum(col("cost_tr_e6")).as("train_nll_e6"),
        sum(col("cost_ref_e6")).as("ref_nll_e6"))
      .select(col("id").as(idCol), col("n_scored"),
        col("train_nll_e6"), col("ref_nll_e6"),
        expr("(train_nll_e6 div n_scored) - (ref_nll_e6 div n_scored)")
          .as("excess_e6"))
      .withColumn("selected", (col("excess_e6") > 0).cast("int"))
  }
}
