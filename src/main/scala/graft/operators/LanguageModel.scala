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
    * of this form follows [[bigramNllNarrow]] with the same
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

  /** A trained bigram model held in memory — the deployment shape of
    * KenLM-style filtering: CCNet ships a PRUNED model to every
    * worker and scores with lookups, never a join. Bigram keys are
    * space-joined ("prev cur" — unambiguous, words contain no
    * whitespace by construction of the tokenizer). */
  final case class BigramModel(uni: Map[String, Long],
                               big: Map[String, Long], total: Long)

  /** Collect the reference counts into a [[BigramModel]], pruned
    * KenLM-style BEFORE the driver collect — the discipline the
    * deployment shape requires: an unpruned reference vocabulary is
    * bounded only by the corpus, and CCNet's production models ship
    * pruned (KenLM `--prune`). Two knobs, applied per count table on
    * the executors so the driver only ever receives the survivors:
    *
    *  - `minCount`: drop grams seen fewer times (count floor);
    *  - `maxEntries`: keep the most frequent M per table
    *    (TakeOrdered — bounded driver memory even against an
    *    adversarial reference), count-desc with a lexicographic
    *    tiebreak for determinism.
    *
    * `total` stays the EXACT unpruned token count (one narrow scan):
    * pruning must not shrink the backoff denominator, or every
    * unknown-word cost would drift with the prune level. A pruned
    * gram scores through the backoff path — exactly how a pruned
    * KenLM degrades. Bigrams whose `prev` lost its unigram entry are
    * dropped too (the seen-bigram path divides by c(prev); KenLM
    * enforces the same lower-order consistency).
    *
    * Defaults (1, MaxValue) reproduce the unpruned model bit-for-bit.
    */
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

  def trainBigrams(ref: DataFrame, refTextCol: String,
                   minCount: Long = 1L,
                   maxEntries: Int = Int.MaxValue): BigramModel = {
    val toks = ref.select(words(col(refTextCol)).as("__w"))
    val uni = prunedCounts(toks.select(explode(col("__w")).as("k")),
      minCount, maxEntries)
    val bigAll = prunedCounts(toks
      .select(explode(graft.functions.TextFunctions
        .shinglesOfWords(col("__w"), 2)).as("k")), minCount, maxEntries)
    // lower-order consistency: a surviving bigram needs its prev's
    // unigram count for the c12/c1 probability
    val big = bigAll.filter { case (k, _) =>
      uni.contains(k.substring(0, k.indexOf(' '))) }
    // exact UNpruned token total — the backoff denominator is corpus
    // mass, not surviving-entry mass. Unpruned, the unigram map IS
    // the full count table, so its sum is the total and the third
    // corpus scan (re-tokenize + agg, the most expensive job here)
    // is pure waste; only a pruning run pays for it.
    val unpruned = minCount <= 1L && maxEntries == Int.MaxValue
    val total =
      if (unpruned) uni.valuesIterator.sum
      else toks.agg(coalesce(sum(size(col("__w"))), lit(0L))
        .cast("long").as("t")).head().getLong(0)
    require(total > 0,
      "trainBigrams: empty reference corpus (every backoff probability " +
        "would divide by zero)")
    BigramModel(uni, big, total)
  }

  // one stable scorer UDF per MODEL: Catalyst compares ScalaUDFs by
  // function reference, so a fresh closure per invocation would make
  // two identical scoring plans never sameResult — breaking the
  // PersistSlots reuse ccnetBuckets depends on (observed: slot
  // misses on every bench trial). Structural case-class keys; the
  // one-time hash of a model's maps is microseconds next to a scan.
  // BOUNDED: each entry pins a vocabulary-scale model in memory, so
  // the cache clears past a few entries (a session reusing one model
  // keeps its identity; one training many models doesn't leak them
  // all — plan reuse only mattered for the repeated-model case).
  private val ScoreCacheCap = 4
  private val bigramScoreCache = scala.collection.concurrent.TrieMap
    .empty[BigramModel, org.apache.spark.sql.expressions.UserDefinedFunction]
  private val trigramScoreCache = scala.collection.concurrent.TrieMap
    .empty[TrigramModel, org.apache.spark.sql.expressions.UserDefinedFunction]
  private def cached[K](cache: scala.collection.concurrent.TrieMap[K,
      org.apache.spark.sql.expressions.UserDefinedFunction], key: K)(
      mk: => org.apache.spark.sql.expressions.UserDefinedFunction) = {
    if (!cache.contains(key) && cache.size >= ScoreCacheCap) cache.clear()
    cache.getOrElseUpdate(key, mk)
  }

  /** [[bigramNll]] against an in-memory model: scoring is ONE narrow
    * projection — per-token costs come from map-literal lookups
    * (O(1) per token, the ADC-LUT pattern) folded inside the row, so
    * it runs shuffle-free on a 100 TB scan AND unchanged on a
    * stream (no stateful aggregation anywhere; see the
    * streaming↔batch equivalence spec). Same arithmetic as
    * [[bigramNll]]: identical association, per-token floor, integer
    * average. */
  def bigramNllNarrow(docs: DataFrame, idCol: String, textCol: String,
                      model: BigramModel): DataFrame =
    bigramNllNarrowOfWords(
      docs.select(col(idCol), words(col(textCol)).as("__gpw")),
      idCol, "__gpw", model)

  /** [[bigramNllNarrow]] over an already-projected word-array column
    * (transform lambdas must read an attribute, not an inline split —
    * see TextFunctions.shinglesOfWords). */
  def bigramNllNarrowOfWords(docs: DataFrame, idCol: String,
                             wordsCol: String,
                             model: BigramModel): DataFrame = {
    // HashMap UDF, NOT typedLit map literals: a Catalyst literal map
    // is ArrayBasedMapData and element_at over it is a LINEAR key
    // scan — O(|model|) per token lookup, which made this "narrow
    // deployment form" quadratic in practice (the trigram sibling
    // measured 84 s at sf0.1 once the bench stopped count()-pruning
    // the projection). The closure's immutable HashMaps are O(1) per
    // lookup; arithmetic is IDENTICAL to the old expression form —
    // same branch ladder, same association, same per-token floor —
    // so the oracles are unchanged (re-validated at all three SFs).
    val score = cached(bigramScoreCache, model) {
      val uni = model.uni; val big = model.big
      val totalD = model.total.toDouble
      udf { (w: Seq[String]) =>
        var nll = 0L
        var i = 0
        val n = w.length
        while (i < n - 1) {
          val ratio = big.get(w(i) + " " + w(i + 1)) match {
            // a surviving bigram's prev always has its unigram entry
            // (lower-order consistency, trainBigrams)
            case Some(c12) => c12.toDouble / uni(w(i)).toDouble
            case None => uni.get(w(i + 1)) match {
              case Some(c2) => 0.4 * (c2.toDouble / totalD)
              case None => 0.4 / (totalD * 10.0)
            }
          }
          nll += math.floor(1000000.0 * -math.log(ratio)).toLong
          i += 1
        }
        nll
      }
    }
    docs
      // the <2-words dropout filters on the CHEAP word-array size
      // BEFORE the score expression exists
      .select(col(idCol), col(wordsCol).as("__gpnw"))
      .filter(size(col("__gpnw")) >= 2)
      .select(col(idCol),
        (size(col("__gpnw")) - 1).cast("long").as("n_scored"),
        score(col("__gpnw")).as("nll_e6"))
      .withColumn("avg_nll_e6", expr("nll_e6 div n_scored"))
  }

  /** A trained trigram model held in memory — [[BigramModel]]'s
    * order-3 sibling. Keys are space-joined grams. */
  final case class TrigramModel(uni: Map[String, Long],
                                big: Map[String, Long],
                                tri: Map[String, Long], total: Long)

  /** Collect trigram/bigram/unigram reference counts with the same
    * KenLM-style pruning discipline as [[trainBigrams]] (executors
    * prune, the driver receives survivors; `total` stays the exact
    * unpruned token count). Lower-order consistency cascades one
    * level further: a surviving bigram needs its `prev` unigram (the
    * backoff ratio divides by c(p1)), and a surviving trigram needs
    * its (p2, p1) CONTEXT bigram (the top ratio divides by
    * c(p2 p1)) — a trigram whose context was pruned scores through
    * the backoff path, exactly how a pruned KenLM degrades. */
  def trainTrigrams(ref: DataFrame, refTextCol: String,
                    minCount: Long = 1L,
                    maxEntries: Int = Int.MaxValue): TrigramModel = {
    val toks = ref.select(words(col(refTextCol)).as("__w"))
    def grams(n: Int) = prunedCounts(toks.select(explode(
      graft.functions.TextFunctions.shinglesOfWords(col("__w"), n)).as("k")),
      minCount, maxEntries)
    val uni = prunedCounts(toks.select(explode(col("__w")).as("k")),
      minCount, maxEntries)
    val big = grams(2).filter { case (k, _) =>
      uni.contains(k.substring(0, k.indexOf(' '))) }
    val tri = grams(3).filter { case (k, _) =>
      big.contains(k.substring(0, k.lastIndexOf(' '))) }
    val unpruned = minCount <= 1L && maxEntries == Int.MaxValue
    val total =
      if (unpruned) uni.valuesIterator.sum
      else toks.agg(coalesce(sum(size(col("__w"))), lit(0L))
        .cast("long").as("t")).head().getLong(0)
    require(total > 0,
      "trainTrigrams: empty reference corpus (every backoff probability " +
        "would divide by zero)")
    TrigramModel(uni, big, tri, total)
  }

  /** A trained 4-gram model — one order beyond [[TrigramModel]],
    * closing on CCNet's production order-5 recipe. Keys are
    * space-joined grams at every order. */
  final case class FourgramModel(uni: Map[String, Long],
                                 big: Map[String, Long],
                                 tri: Map[String, Long],
                                 four: Map[String, Long], total: Long)

  /** Collect 4/3/2/1-gram reference counts with the same KenLM-style
    * pruning discipline as the lower orders (one shared
    * [[prunedCounts]] builder for all four tables). The lower-order
    * consistency cascade runs one level further: a surviving 4-gram
    * needs its (p3 p2 p1) CONTEXT trigram (the top ratio divides by
    * c(p3 p2 p1)) — a 4-gram whose context was pruned scores through
    * the backoff path, exactly how a pruned KenLM degrades. */
  def trainFourgrams(ref: DataFrame, refTextCol: String,
                     minCount: Long = 1L,
                     maxEntries: Int = Int.MaxValue): FourgramModel = {
    val toks = ref.select(words(col(refTextCol)).as("__w"))
    def grams(n: Int) = prunedCounts(toks.select(explode(
      graft.functions.TextFunctions.shinglesOfWords(col("__w"), n)).as("k")),
      minCount, maxEntries)
    val uni = prunedCounts(toks.select(explode(col("__w")).as("k")),
      minCount, maxEntries)
    val big = grams(2).filter { case (k, _) =>
      uni.contains(k.substring(0, k.indexOf(' '))) }
    val tri = grams(3).filter { case (k, _) =>
      big.contains(k.substring(0, k.lastIndexOf(' '))) }
    val four = grams(4).filter { case (k, _) =>
      tri.contains(k.substring(0, k.lastIndexOf(' '))) }
    val unpruned = minCount <= 1L && maxEntries == Int.MaxValue
    val total =
      if (unpruned) uni.valuesIterator.sum
      else toks.agg(coalesce(sum(size(col("__w"))), lit(0L))
        .cast("long").as("t")).head().getLong(0)
    require(total > 0,
      "trainFourgrams: empty reference corpus (every backoff probability " +
        "would divide by zero)")
    FourgramModel(uni, big, tri, four, total)
  }

  private val fourgramScoreCache = scala.collection.concurrent.TrieMap
    .empty[FourgramModel, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** 4-gram NLL against an in-memory [[FourgramModel]] — the
    * broadcast-narrow deployment form at order 4, extending the
    * stupid-backoff recursion one level (0.4^k multiplier per
    * backoff step, unknown at 0.4^3/(total·10)). Same HashMap-UDF
    * shape and caching discipline as the lower orders; positions
    * 4..n score, documents under 4 words drop out.
    * @return (idCol, n_scored, nll_e6, avg_nll_e6) */
  def fourgramNllNarrow(docs: DataFrame, idCol: String, textCol: String,
                        model: FourgramModel): DataFrame = {
    val score = cached(fourgramScoreCache, model) {
      val uni = model.uni; val big = model.big
      val tri = model.tri; val four = model.four
      val totalD = model.total.toDouble
      udf { (w: Seq[String]) =>
        var nll = 0L
        var i = 0
        val n = w.length
        while (i < n - 3) {
          val p2 = w(i + 1); val p1 = w(i + 2); val cur = w(i + 3)
          val ratio =
            four.get(w(i) + " " + p2 + " " + p1 + " " + cur) match {
              // surviving 4-gram => its context trigram survives
              case Some(c1234) =>
                c1234.toDouble / tri(w(i) + " " + p2 + " " + p1).toDouble
              case None => tri.get(p2 + " " + p1 + " " + cur) match {
                // surviving trigram => its context bigram survives
                case Some(c123) =>
                  0.4 * (c123.toDouble / big(p2 + " " + p1).toDouble)
                case None => big.get(p1 + " " + cur) match {
                  // surviving bigram => its prev unigram survives
                  case Some(c12) =>
                    0.16 * (c12.toDouble / uni(p1).toDouble)
                  case None => uni.get(cur) match {
                    case Some(c2) => 0.064 * (c2.toDouble / totalD)
                    case None => 0.064 / (totalD * 10.0)
                  }
                }
              }
            }
          nll += math.floor(1000000.0 * -math.log(ratio)).toLong
          i += 1
        }
        nll
      }
    }
    docs
      .select(col(idCol), words(col(textCol)).as("__gpnw"))
      .filter(size(col("__gpnw")) >= 4)
      .select(col(idCol),
        (size(col("__gpnw")) - 3).cast("long").as("n_scored"),
        score(col("__gpnw")).as("nll_e6"))
      .withColumn("avg_nll_e6", expr("nll_e6 div n_scored"))
  }

  /** [[trigramNll]] against an in-memory [[TrigramModel]]: the
    * broadcast-narrow deployment form — per-token costs from map
    * lookups folded inside the row, zero exchanges and zero joins on
    * the corpus side, stream-safe. Same arithmetic as the join form
    * (identical association per ladder branch, per-token floor), so
    * an unpruned model reproduces it byte-for-byte and shares its
    * oracle. */
  def trigramNllNarrow(docs: DataFrame, idCol: String, textCol: String,
                       model: TrigramModel): DataFrame = {
    // HashMap UDF for the same reason as [[bigramNllNarrowOfWords]]:
    // element_at on a literal map is a linear key scan, and the
    // trigram model is the largest map in the engine (84 s at sf0.1
    // in the literal form). The ladder, association and per-token
    // floor replicate the old expression form exactly.
    val score = cached(trigramScoreCache, model) {
      val uni = model.uni; val big = model.big; val tri = model.tri
      val totalD = model.total.toDouble
      udf { (w: Seq[String]) =>
        var nll = 0L
        var i = 0
        val n = w.length
        while (i < n - 2) {
          val p1 = w(i + 1); val cur = w(i + 2)
          val ratio = tri.get(w(i) + " " + p1 + " " + cur) match {
            // a surviving trigram's (p2, p1) context bigram survives
            // (lower-order consistency, trainTrigrams)
            case Some(c123) => c123.toDouble / big(w(i) + " " + p1).toDouble
            case None => big.get(p1 + " " + cur) match {
              // a surviving bigram's prev keeps its unigram entry
              case Some(c12b) => 0.4 * (c12b.toDouble / uni(p1).toDouble)
              case None => uni.get(cur) match {
                case Some(c2) => 0.16 * (c2.toDouble / totalD)
                case None => 0.16 / (totalD * 10.0)
              }
            }
          }
          nll += math.floor(1000000.0 * -math.log(ratio)).toLong
          i += 1
        }
        nll
      }
    }
    docs
      // dropout on the cheap array size BEFORE the score expression
      // exists (see bigramNllNarrowOfWords)
      .select(col(idCol), words(col(textCol)).as("__gpnw"))
      .filter(size(col("__gpnw")) >= 3)
      .select(col(idCol),
        (size(col("__gpnw")) - 2).cast("long").as("n_scored"),
        score(col("__gpnw")).as("nll_e6"))
      .withColumn("avg_nll_e6", expr("nll_e6 div n_scored"))
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
    * ([[bigramNllNarrow]], zero exchanges); the tercile computation
    * runs on the VALUE HISTOGRAM (one map-combined count per
    * distinct micro-nat average — the exact-quantile-via-histogram
    * tradeoff q_histogram already takes; its global cumulative
    * window orders distinct values, not documents); thresholds ride
    * back as a one-row broadcast. The corpus itself is touched by
    * exactly one scan plus one narrow CASE projection.
    *
    * @return (idCol, avg_nll_e6, bucket) for every scored doc */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   model: BigramModel): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramNllNarrow(docs, idCol, textCol, model)
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
}
