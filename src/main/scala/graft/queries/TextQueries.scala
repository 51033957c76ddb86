package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Text-analysis operators over the documents table, each mirrored by
  * an arithmetic-identical DuckDB oracle (integer/string functions
  * only, so hash equality is exact; ratios divide the same integer
  * operands in both engines).
  */
object TextQueries {

  private[queries] def sqlStopwords(lang: String): String =
    stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** q_vocab_coverage candidate vocabulary sizes — spans the regimes
    * where the corpus's bigram-unit vocabulary is partially and
    * fully covered (ascending; max bounds the TakeOrdered cut). */
  private val VOCAB_SIZES = Seq(100, 400, 8000)

  /** q_curriculum_order difficulty bucket width in micro-nats
    * (0.2 nats of average NLL per curriculum phase). */
  private val CURR_STEP = 200000L

  /** q_domain_reweight learning rate: base-share multiplier per
    * micro-nat of excess hardness (2 ⇒ a source 0.5 nat above the
    * corpus mean doubles its boost term). */
  private val DR_ETA = 2L

  /** q_k_anonymity risk threshold: quasi-identifier classes smaller
    * than this are flagged (Sweeney's canonical k=5). */
  private val K_MIN = 5L

  /** q_l_diversity risk threshold: quasi-identifier classes with
    * fewer distinct sensitive values than this are flagged
    * (Machanavajjhala et al.'s canonical l=3). */
  private val L_MIN = 3L

  /** q_t_closeness risk threshold in e6: distance buckets at or above
    * t=0.2 (the worked example in Li et al. 2007) are flagged. */
  private val T_MAX_E6 = 200000L

  /** Shared DuckDB replay of Reputation.sourceStats — one CTE chain;
    * `filtered` swaps the final projection between the per-source
    * stats table and the reputation-gated document list. Integer
    * floor-divisions (`//`) mirror Spark's `div` on the same
    * non-negative operands. */
  private def sourceReputationSql(filtered: Boolean): String = {
    val base =
      """WITH m AS (
        |  SELECT doc_id, source, lang, md5(text) AS h,
        |    CAST(floor(CAST(len(list_intersect(list_distinct(
        |        regexp_split_to_array(trim(lower(text)), '\s+')), SW)) AS DOUBLE)
        |      / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
        |      * 10000) AS BIGINT) AS stop_e4
        |  FROM documents),
        |d AS (SELECT *, CASE WHEN count(*) OVER (PARTITION BY h) > 1
        |                     THEN 1 ELSE 0 END AS dup FROM m),
        |s AS (SELECT source, count(*) AS n_docs,
        |        CAST(sum(dup) AS BIGINT) AS n_dup_docs,
        |        CAST(sum(stop_e4) AS BIGINT) AS stop_sum
        |      FROM d GROUP BY 1),
        |l AS (SELECT source, lang, count(*) AS n FROM m GROUP BY 1, 2),
        |t AS (SELECT source, lang, n, row_number() OVER
        |        (PARTITION BY source ORDER BY n DESC, lang ASC) AS rn
        |      FROM l),
        |j AS (SELECT s.source, s.n_docs, s.n_dup_docs,
        |        s.n_dup_docs * 10000 // s.n_docs AS dup_e4,
        |        s.stop_sum // s.n_docs AS mean_stop_e4,
        |        t.lang AS top_lang,
        |        t.n * 10000 // s.n_docs AS lang_share_e4
        |      FROM s JOIN t ON s.source = t.source AND t.rn = 1),
        |r AS (SELECT *, ((10000 - dup_e4) * 5 + mean_stop_e4 * 3
        |        + lang_share_e4 * 2) // 10 AS rep_e4 FROM j)
        |""".stripMargin.replace("SW", sqlStopwords("en"))
    if (filtered)
      base +
        """SELECT m.doc_id, m.source, m.lang
          |FROM m JOIN r ON m.source = r.source
          |WHERE r.rep_e4 >= 5900""".stripMargin
    else
      base +
        """SELECT source, n_docs, n_dup_docs, dup_e4, mean_stop_e4,
          |  top_lang, lang_share_e4, rep_e4 FROM r""".stripMargin
  }

  // stable UDF identity (val, not per-invocation closure — the plan
  // sameResult discipline): max multiplicity of any element
  private val topCount = udf { (bg: Seq[String]) =>
    if (bg == null || bg.isEmpty) 0L
    else {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      bg.foreach(b => m.update(b, m.getOrElse(b, 0L) + 1L))
      m.valuesIterator.max
    }
  }

  /** Trained BPE merge lists per (session, dir) — the deployed
    * tokenizer's artifact; see q_bpe_encode. */
  private val mergeCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), Seq[(String, String)]]

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting: whitespace + BPE-ish regex
    "text_tokens" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_ws"),
        bpeishTokenCount(col("text")).cast("long").as("n_bpe"))),

    // char-distribution Shannon entropy (e4 nats): the gibberish /
    // padding / base64-blob signal — doc-local HOF counts, no
    // explode, deterministic fold order so the SQL replay is exact
    "text_entropy" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        charDistinct(col("text")).as("n_uniq"),
        charEntropyE4(col("text")).as("entropy_e4"))),

    // quality scoring: length/stopword/alpha signals, one weighted score
    "text_quality" -> ((s, dir) => {
      val t = Tables(s, dir, "documents")
      val nWords = tokenCount(col("text")).cast("double")
      val hits = vocabHits(col("text"), stopwords("en")).cast("double")
      val alpha = length(regexp_replace(lower(col("text")), "[^a-z]", ""))
        .cast("double")
      val nChars = length(col("text")).cast("double")
      // ratios ship as floor-scaled basis points: floor of identical
      // IEEE doubles is bit-exact across engines, where round() can
      // disagree on exact .xxxx5 boundaries (one sf0.1 row hit this)
      t.select(
        col("doc_id"),
        nWords.cast("long").as("n_words"),
        floor((hits / nWords) * 10000).cast("long").as("stopword_ratio_e4"),
        floor((alpha / nChars) * 10000).cast("long").as("alpha_ratio_e4"),
        floor((
          lit(0.4) * (hits / nWords) +
            lit(0.3) * least(nWords / 50.0, lit(1.0)) +
            lit(0.3) * (alpha / nChars)) * 10000).cast("long").as("quality_e4"))
    }),

    // per-source (domain) reputation: corpus-wide dup rate + mean
    // stopword quality + language consistency, one integer score per
    // source (Reputation.scala — the RefinedWeb per-domain gate)
    "q_source_reputation" -> ((s, dir) =>
      graft.operators.Reputation.sourceStats(
        Tables(s, dir, "documents"), "text", "source", "lang",
        stopwords("en"))),

    // the document gate on that reputation: keep docs whose source
    // scores >= 5900 e4 — a broadcast semi-join against the tiny
    // source table, document text never re-shuffles
    "q_source_filter" -> ((s, dir) =>
      graft.operators.Reputation.sourceFilter(
          Tables(s, dir, "documents"), "text", "source", "lang",
          stopwords("en"), minRep = 5900L)
        .select(col("doc_id"), col("source"), col("lang"))),

    // language guess: stopword-profile argmax (deterministic ties)
    "text_langid" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), langId(col("text")).as("lang_guess"))),

    // bag-of-words fingerprint per document
    "text_fingerprint" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), fingerprint(col("text")).as("fp"))),

    // winnowed (MOSS-style) fingerprints: rolling-window minima over
    // shingle hashes — all list-level expressions, zero shuffles
    "text_winnow" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("__w"))
        .select(col("doc_id"), shinglesOfWords(col("__w"), 3).as("__sh"))
        .select(col("doc_id"), shingleHashes48(col("__sh")).as("__hs"))
        .select(col("doc_id"), winnowedMins(col("__hs"), w = 4).as("__mins"))
        .select(
          col("doc_id"),
          size(array_distinct(col("__mins"))).cast("long").as("n_prints"),
          md5(concat_ws(",",
            array_sort(array_distinct(col("__mins"))).cast("array<string>")))
            .as("fp"))),

    // TF-IDF top terms per document. Scale shape: tf = one shuffle on
    // (doc, term) with map-side combine; df = second map-combined
    // shuffle on term; tf x df meet in an equi-join on term (NOT
    // broadcast — vocabulary grows with the corpus); corpus size N
    // rides in as a broadcast 1-row frame. Scores ship as
    // floor-scaled e4 integers so the ln() arithmetic hash-matches
    // across engines, and ranking orders by that integer.
    "text_tfidf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        explode(words(col("text"))).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, Seq("term"))
        .crossJoin(broadcast(n))
        .withColumn("tfidf_e4",
          floor(col("tf") * log(col("n").cast("double") / col("df")) * 10000)
            .cast("long"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf_e4").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("tfidf_e4"), col("rank"))
    }),

    // exact dedup on the fingerprint (word-order/repetition invariant):
    // duplicate groups with the surviving id
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables(s, dir, "documents"), "doc_id",
          fingerprint(col("text")))
        .select(col("dup_key"), col("keep_id"), col("cnt"))),

    // PII masking: email then phone patterns replaced in one codegen'd
    // pass (regexes are RE2-safe so the oracle replays them verbatim).
    // The synthetic corpus has no PII, so a deterministic contact
    // string is appended first — built identically in both engines —
    // and the masking must strip exactly it.
    "text_pii" -> ((s, dir) => {
      val synth = concat(
        substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or +1-555-01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit(" today"))
      Tables(s, dir, "documents").select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(synth,
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "\\+?[0-9][0-9()\\-]{6,}", "<PHONE>").as("masked"))
    }),

    // Unicode NFC normalization: a decomposed combining sequence is
    // appended deterministically in both engines (the corpus is
    // ASCII), then normalization must compose it — n_before/n_after
    // pin that a codepoint actually merged
    "text_normalize" -> ((s, dir) => {
      val synth = concat(substring(col("text"), 1, 20),
        lit(" cafe"), lit("\u0301"), lit(" fin"))
      Tables(s, dir, "documents").select(
        col("doc_id"),
        length(synth).cast("long").as("n_before"),
        length(normalizeNfc(synth)).cast("long").as("n_after"),
        normalizeNfc(synth).as("normalized"))
    }),

    // composite quality-filter chain (C4/Gopher-style): word-count
    // bounds, chars-per-word, lexical diversity; keep flag + first
    // failing rule. Ratios floor-scaled e4, thresholds on the integer.
    "text_filter" -> ((s, dir) => {
      // project the word array once (regex expressions have no CSE)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), words(col("text")).as("__w"))
        .select(col("doc_id"), col("n_chars"),
          size(col("__w")).cast("long").as("wc"),
          size(array_distinct(col("__w"))).cast("long").as("dw"))
        .select(col("doc_id"), col("wc"),
          floor(col("n_chars").cast("double") / col("wc") * 10000)
            .cast("long").as("cpw_e4"),
          floor(col("dw").cast("double") / col("wc") * 10000)
            .cast("long").as("div_e4"))
        .withColumn("reason",
          when(col("wc") < 30, "too_short")
            .when(col("wc") > 300, "too_long")
            .when(col("cpw_e4") > 80000L, "long_words")
            .when(col("div_e4") < 3000L, "low_diversity")
            .otherwise("ok"))
        .withColumn("keep", (col("reason") === "ok").cast("int"))
    }),

    // Gopher-style repetition signals: top-bigram occupancy and the
    // duplicate-trigram fraction — the rules that catch boilerplate
    // and degenerate repetition. Trigram stats are list-local (zero
    // shuffle); the top-bigram count is one map-combined aggregation
    // on (doc, bigram) — the only shuffle, and it carries counts,
    // not text.
    "text_repetition" -> ((s, dir) => {
      // the top-bigram count is a PER-DOCUMENT statistic: one
      // hash-counting UDF per row replaces the old explode ->
      // (doc, bigram) groupBy -> per-doc max -> join-back pipeline
      // (a corpus-wide shuffle to compute a doc-local number, and
      // the shingle subtree evaluated on both join sides)
      Tables(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("__w"))
        .select(col("doc_id"),
          shinglesOfWords(col("__w"), 2).as("__bg"),
          shinglesOfWords(col("__w"), 3).as("__tri"))
        .select(col("doc_id"),
          size(col("__bg")).cast("long").as("n_bigrams"),
          topCount(col("__bg")).as("top_bigram_cnt"),
          size(col("__tri")).cast("long").as("n_tri"),
          size(array_distinct(col("__tri"))).cast("long").as("d_tri"))
        .select(col("doc_id"), col("n_bigrams"), col("top_bigram_cnt"),
          when(col("n_bigrams") > 0,
            floor(col("top_bigram_cnt").cast("double") /
              col("n_bigrams") * 10000).cast("long"))
            .otherwise(lit(0L)).as("top_bigram_frac_e4"),
          when(col("n_tri") > 0,
            floor((col("n_tri") - col("d_tri")).cast("double") /
              col("n_tri") * 10000).cast("long"))
            .otherwise(lit(0L)).as("dup_trigram_frac_e4"))
        .withColumn("repetitive",
          (col("top_bigram_frac_e4") > 1800L ||
            col("dup_trigram_frac_e4") > 3000L).cast("int"))
    }),

    // benchmark decontamination: train docs sharing any word 3-gram
    // with the eval holdout (deterministic holdout: doc_id % 97 = 0)
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.operators.Decontaminate.overlapReport(
        train = docs.filter(col("doc_id") % 97 =!= 0),
        eval = docs.filter(col("doc_id") % 97 === 0),
        idCol = "doc_id", textCol = "text", n = 3)
    }),

    // difficulty-ordered curriculum plan: bucket every scored doc by
    // its bigram-LM average NLL (0.2-nat steps), order buckets
    // easy -> hard with per-bucket and cumulative doc/token counts —
    // the schedule table a curriculum (or quality-annealing) run
    // reads to decide where each training phase's token budget ends.
    // Cumulative windows run over the BUCKET histogram (the
    // ccnetBuckets order-statistic pattern), never over docs; docs
    // under 2 words carry no score and drop (the bigram rule).
    "q_curriculum_order" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val model = graft.operators.LanguageModel.trainNgrams(
        docs.filter(col("doc_id") % 5 === 0), "text", order = 2)
      val nll = graft.operators.LanguageModel.ngramNllNarrow(
        docs, "doc_id", "text", model)
      val tk = docs.select(col("doc_id"),
        bpeishTokenCount(col("text")).cast("long").as("n_tok"))
      val h = nll.join(tk, "doc_id")
        .select(expr(s"(avg_nll_e6 div $CURR_STEP) * $CURR_STEP")
          .as("difficulty_e6"), col("n_tok"))
      val hist = h.groupBy(col("difficulty_e6"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
      val totals = h.agg(sum(col("n_tok")).as("__tt"))
      val w = Window.partitionBy(col("difficulty_e6") * 0)
        .orderBy(col("difficulty_e6").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum_docs", sum(col("n_docs")).over(w))
        .withColumn("cum_tok", sum(col("sum_tok")).over(w))
        .crossJoin(broadcast(totals))
        .select(col("difficulty_e6"), col("n_docs"), col("sum_tok"),
          col("cum_docs"), col("cum_tok"),
          expr("cum_tok * 10000 div __tt").as("tok_share_e4"))
    }),

    // vocabulary coverage curve: what fraction of unit OCCURRENCES
    // the top-V most-frequent unit types cover, per candidate vocab
    // size — the OOV-rate planner a tokenizer/vocab-size choice
    // rides on (the complement of coverage_e4 is the UNK/fallback
    // rate a V-sized vocab would eat). Units here are word BIGRAMS
    // (merge candidates, the BPE-vocab planning frame; the synthetic
    // corpus's unigram vocabulary is a few dozen types — flat curve
    // — while its bigram space actually exercises the ladder). The
    // top-maxV cut is a bounded TakeOrdered (never a full vocabulary
    // sort); the windows after it run over <= maxV rows. 100 TB
    // shape: the corpus pays one map-combined unit count; everything
    // downstream is vocabulary-bounded.
    "q_vocab_coverage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val freq = Tables(s, dir, "documents")
        .select(explode(
          shinglesOfWords(words(col("text")), 2)).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val freqP = graft.operators.PersistSlots.swap(
        "text.vocabCoverageFreq", freq)
      val top = freqP
        .orderBy(col("cnt").desc, col("term").asc).limit(VOCAB_SIZES.max)
        // constant-key partition (q_rrf's idiom): the frame is the
        // <= maxV-row limit above, but an unpartitioned orderBy
        // window WARNs in every gate/bench log and pattern-matches a
        // scale-killer. The key must survive TWO optimizer rules:
        // a literal spec is stripped outright, and `cnt * 0` on the
        // NON-NULLABLE count folds to 0 and is then stripped by
        // EliminateWindowPartitions (q_rrf's doc_id is nullable, so
        // its bare `* 0` survives; cnt's does not) — the coalesce
        // over a NULLABLE-typed zero is runtime-constant but
        // statically unfoldable
        .withColumn("rk", row_number().over(
          Window.partitionBy(coalesce(length(col("term")) * 0, lit(0)))
            .orderBy(col("cnt").desc, col("term").asc)).cast("long"))
      val topP = graft.operators.PersistSlots.swap(
        "text.vocabCoverageTop", top)
      val totals = freqP.agg(sum(col("cnt")).as("total_tok"),
        count(lit(1)).as("n_types"))
      VOCAB_SIZES.map { v =>
        topP.filter(col("rk") <= v)
          .agg(count(lit(1)).as("n_terms"),
            sum(col("cnt")).as("covered_tok"))
          .withColumn("vocab_size", lit(v))
      }.reduce(_.unionByName(_))
        // degenerate-corpus guard: on a corpus with zero bigrams each
        // leg's global agg still emits one (count=0, null) row while
        // the oracle's legs emit none — dropping n_terms = 0 rows
        // makes the empty-vocabulary shape match (and coverage_e4's
        // divisor is never 0 past it)
        .filter(col("n_terms") > 0)
        .crossJoin(broadcast(totals))
        .select(col("vocab_size"), col("n_terms"), col("covered_tok"),
          col("total_tok"), col("n_types"),
          expr("covered_tok * 10000 div total_tok").as("coverage_e4"))
    }),

    // DoReMi-shaped domain-mixture reweighting (Xie et al. 2023),
    // linearized into integer fixed point (Mixture scaladoc): score
    // every doc under the shared %5-slice bigram LM (one broadcast-
    // model scan, the q_perplexity path), aggregate hardness per
    // source, upweight sources above the corpus-mean NLL — the
    // next-epoch sampling table a mixture scheduler reads
    "q_domain_reweight" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val model = graft.operators.LanguageModel.trainNgrams(
        docs.filter(col("doc_id") % 5 === 0), "text", order = 2)
      val nll = graft.operators.LanguageModel.ngramNllNarrow(
        docs, "doc_id", "text", model)
      val perDoc = docs.select(col("doc_id"), col("source"),
          bpeishTokenCount(col("text")).cast("long").as("n_tok"))
        .join(nll.select(col("doc_id"), col("avg_nll_e6")),
          Seq("doc_id"), "left")
      graft.operators.Mixture.domainReweightStep(perDoc, "source",
        "avg_nll_e6", "n_tok", etaE0 = DR_ETA)
    }),

    // k-anonymity over corpus metadata (source x lang x 10-word
    // length bucket as the quasi-identifier tuple): the group-size
    // distribution with k < K_MIN classes flagged — the
    // re-identification-risk report a privacy review reads next to
    // text_pii's scrub (a doc alone in its cell is linkable even
    // with its PII strings gone)
    "q_k_anonymity" -> ((s, dir) => {
      val nw = wordCount(col("text")).cast("long")
      graft.operators.Expectations.kAnonymityProfile(
        Tables(s, dir, "documents"),
        Seq(col("source"), col("lang"),
          (nw - pmod(nw, lit(10L))).as("len_bucket")),
        kMin = K_MIN)
    }),

    // l-diversity companion (round 15): k-anonymity's blind spot is
    // a big class whose members all share ONE sensitive value — the
    // class leaks it at any k. Quasi-ids here are (lang x length
    // bucket); the sensitive attribute is the source (which corpus a
    // document came from is exactly what a de-anonymization attack
    // wants); classes with fewer than L_MIN distinct sources flag
    "q_l_diversity" -> ((s, dir) => {
      val nw = wordCount(col("text")).cast("long")
      graft.operators.Expectations.lDiversityProfile(
        Tables(s, dir, "documents"),
        Seq(col("lang"), (nw - pmod(nw, lit(10L))).as("len_bucket")),
        col("source"), lMin = L_MIN)
    }),

    // t-closeness (round 16): the privacy ladder's third rung —
    // l-diversity still leaks when a class's sensitive values are
    // diverse but SKEWED vs the corpus (a class 90% one source
    // reveals likely membership at any l). Per class the exact-e6
    // total-variation distance between class and corpus sensitive
    // distributions, histogrammed over 0.1-wide buckets, >= t=0.2
    // flagged. Same quasi-ids/sensitive as q_l_diversity.
    "q_t_closeness" -> ((s, dir) => {
      val nw = wordCount(col("text")).cast("long")
      graft.operators.Expectations.tClosenessProfile(
        Tables(s, dir, "documents"),
        Seq(col("lang"), (nw - pmod(nw, lit(10L))).as("len_bucket")),
        col("source"), tMaxE6 = T_MAX_E6)
    }),

    // ARI readability grade (round 15): the classic chars-per-word x
    // words-per-sentence formula in e2 fixed point — the grade-level
    // bucket a textbook-quality selection sorts by, one narrow
    // codegen'd scan, no explode, no shuffle
    "q_readability" -> ((s, dir) =>
      graft.operators.Quality.readability(
        Tables(s, dir, "documents"), "doc_id", "text")),

    // excess-loss (RHO-style learnability) data selection (round
    // 15): two bigram models — reference split (doc_id % 5 = 0) vs
    // the whole corpus — score every doc in one pairs pass; docs the
    // reference finds easy but the corpus model finds hard carry
    // positive excess and are selected. The integer-exact n-gram
    // restatement of loss-based data selection
    "q_excess_loss" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.operators.LanguageModel.excessLoss(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") % 5 === 0), "text")
    }),

    // the PLANNER view of decontamination: per-(source x benchmark)
    // contamination matrix over a two-benchmark eval suite
    // (deterministic pseudo-benchmarks: doc_id % 13 / % 17 slices;
    // train = everything in neither) — the table a curation review
    // reads before choosing drops
    "q_contamination_matrix" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val evals = docs.filter(col("doc_id") % 13 === 0)
        .withColumn("eval_set", lit("eval_a"))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .withColumn("eval_set", lit("eval_b")))
      graft.operators.Decontaminate.contaminationMatrix(
        train = docs.filter(col("doc_id") % 13 =!= 0 &&
          col("doc_id") % 17 =!= 0),
        groupCol = "source", evals = evals, setCol = "eval_set",
        idCol = "doc_id", textCol = "text", n = 3)
    }),

    // C4/UT1-style blocklist pass: count blocklisted tokens per doc,
    // keep under a hit budget — the exclusion twin of the Gopher
    // required-stopwords rule. Zero exchanges: the list is a
    // broadcast array literal, the count a doc-local fold
    "q_blocklist" -> ((s, dir) =>
      graft.operators.Quality.blocklistAnnotate(
        Tables(s, dir, "documents"), "doc_id", "text",
        blocklist = Seq("slow", "bug", "crash"), maxHits = 2)),

    // the REWRITE half of decontamination: scrub every word inside
    // an 8-gram shared with the eval slice, keep the rest — span
    // removal instead of document drop (long grams: a scrub must
    // not eat ordinary text)
    "text_decontaminate_scrub" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.operators.Decontaminate.scrubOverlaps(
        train = docs.filter(col("doc_id") % 97 =!= 0),
        eval = docs.filter(col("doc_id") % 97 === 0),
        idCol = "doc_id", textCol = "text", n = 8)
    }),

    // SEMANTIC decontamination: train vectors within a cosine radius
    // of any eval vector (paraphrase leakage the n-gram rule misses).
    // Eval side broadcast, corpus pays one narrow scan — same 100 TB
    // shape as text_decontaminate
    "text_decontaminate_semantic" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      graft.operators.Decontaminate.semanticOverlapReport(
        train = emb.filter(col("vec_id") % 97 =!= 0),
        eval = emb.filter(col("vec_id") % 97 === 0),
        "vec_id", "embedding", minCosine = 0.3)
    }),

    // corpus-novelty audit: the fraction of a document's distinct
    // 3-gram shingles appearing NOWHERE else in the corpus (df = 1) —
    // the diversity signal dedup's inverse asks for ("how much of
    // this doc is boilerplate?"). One gram-key exchange (tfidf's
    // shape) + one per-doc aggregate; e4 exact fixed point
    "text_novelty" -> ((s, dir) => {
      // words projected FIRST: shinglesOfWords' transform lambda must
      // read an attribute — an inline words(text) re-evaluates the
      // regex split per element (the documented TextFunctions trap;
      // measured ~30x on this query)
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("__w"))
        .select(col("doc_id"),
          explode(array_distinct(
            shinglesOfWords(col("__w"), 3))).as("g"))
      // NO gram-keyed join back to the occurrence table: a df=1 gram
      // lives in exactly ONE document, so min(doc_id) per gram routes
      // each unique gram to its owner — two map-combined aggregations
      // where the join form re-shuffled every occurrence (and at
      // corpus scale the occurrence table is the big one)
      val perDoc = sh.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"))
      val uniq = sh.groupBy(col("g"))
        .agg(count(lit(1)).as("__df"), min(col("doc_id")).as("doc_id"))
        .filter(col("__df") === 1)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("__nu"))
      perDoc.join(uniq, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("__nu"), lit(0L)).as("n_unique"))
        .select(col("doc_id"), col("n_grams"), col("n_unique"),
          graft.operators.IntMath.scaledDivTrunc(
            col("n_unique"), 10000L, col("n_grams")).as("novelty_e4"))
    }),

    // cross-snapshot novelty: what fraction of the current crawl's
    // distinct 3-gram vocabulary is NEW vs the reference snapshot —
    // the "did this crawl actually add content" monitor next to the
    // drift family (a crawl can shift distributions while adding
    // nothing, or hold them steady while 90% novel). Gram-key anti
    // join over distinct gram sets: vocabulary-bounded exchanges,
    // corpus touched by one scan per side. One summary row, e4.
    "q_novel_content" -> ((s, dir) => {
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("__w"))
        .select(col("doc_id"),
          explode(array_distinct(shinglesOfWords(col("__w"), 3))).as("g"))
      val ref = sh.filter(col("doc_id") % 2 === 0).select(col("g")).distinct()
      val cur = sh.filter(col("doc_id") % 2 === 1).select(col("g")).distinct()
      val novel = cur.join(ref, Seq("g"), "left_anti")
      cur.agg(count(lit(1)).as("n_cur_grams"))
        .crossJoin(broadcast(novel.agg(count(lit(1)).as("n_novel"))))
        .select(col("n_cur_grams"), col("n_novel"),
          when(col("n_cur_grams") > 0, graft.operators.IntMath
            .scaledDivTrunc(col("n_novel"), 10000L, col("n_cur_grams")))
            .as("novel_e4"))
    }),

    // context-window chunking: overlapping token windows (size 50,
    // stride 25) — the document -> training-sequence step. Pure list
    // expressions then one explode: narrow, no shuffle; chunk_hash
    // content-addresses each window for downstream chunk-level dedup.
    "text_chunk" -> ((s, dir) => {
      val winSize = 50
      val stride = 25
      Tables(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("__w"))
        .select(col("doc_id"), col("__w"),
          // window count = max(1, ceil((n - size) / stride) + 1): the
          // last window is the first one whose end reaches n, so no
          // window is a pure suffix of its predecessor (with
          // size = 2*stride a naive ceil(n/stride) would always emit
          // one fully-contained duplicate window at the end)
          sequence(lit(0),
            greatest(ceil((size(col("__w")) - winSize).cast("double") / stride)
              .cast("int"), lit(0)) * stride,
            lit(stride)).as("__starts"))
        .select(col("doc_id"),
          posexplode(transform(col("__starts"),
            st => slice(col("__w"), st + 1, lit(winSize)))).as(Seq("chunk_id", "__c")))
        .filter(size(col("__c")) > 0)
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          size(col("__c")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("__c"))).as("chunk_hash"))
    }),

    // one BPE merge step: corpus-wide adjacent character-pair counts,
    // top 20 — the inner loop of tokenizer training, in its textbook
    // shape: aggregate to the word-FREQUENCY table first (vocabulary
    // << token count), then count pairs once per distinct word
    // weighted by its frequency. The pair explode runs over the
    // vocabulary, not the corpus; the global top-k plans as
    // TakeOrderedAndProject (no full sort).
    "q_bpe_step" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(words(col("text"))).as("__wd"))
        .groupBy(col("__wd")).agg(count(lit(1)).as("__wc"))
        .filter(length(col("__wd")) >= 2)
        .select(col("__wc"),
          explode(transform(sequence(lit(1), length(col("__wd")) - 1),
            i => col("__wd").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("__wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(20)),

    // BPE tokenizer training: iterate the pair-count step with
    // greedy rank-1 merges applied to the word-frequency table until
    // 8 merges — completes the tokenizer-training story q_bpe_step
    // started. All rounds run over the vocabulary, not the corpus.
    "q_bpe_train" -> ((s, dir) => {
      val wf = Tables(s, dir, "documents")
        .select(explode(words(col("text"))).as("__wd"))
        .groupBy(col("__wd")).agg(count(lit(1)).as("__wc"))
      graft.operators.Bpe.train(wf, "__wd", "__wc", nMerges = 8)
    }),

    // BPE encode with the trained merges: tokenize the corpus by
    // applying the rank-ordered merge list — the per-word fold runs
    // over the VOCABULARY (distinct words), corpus tokens just
    // equi-join to it. Per-doc BPE token counts come out. The merge
    // list memoizes per (session, dir) — training is q_bpe_train's
    // own benchmark; a deployed tokenizer loads its merges, it does
    // not re-train per encode.
    "q_bpe_encode" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("__wd"))
      val wf = toks.groupBy(col("__wd")).agg(count(lit(1)).as("__wc"))
      val merges = mergeCache.getOrElseUpdate((s, dir),
        graft.operators.Bpe.train(wf, "__wd", "__wc", nMerges = 8)
          .orderBy("rank").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq)
      val seg = graft.operators.Bpe
        .segmentWords(wf.select(col("__wd")), "__wd", merges)
        .select(col("__wd"), size(col("syms")).cast("long").as("__n"))
      toks.filter(length(col("__wd")) >= 1)
        .join(seg, "__wd")
        .groupBy(col("doc_id"))
        .agg(sum(col("__n")).as("n_bpe_tokens"),
          count(lit(1)).as("n_words"))
    }),

    // tokenizer fertility: BPE tokens per word by language — the
    // standard multilingual-tokenizer health metric (a lang whose
    // fertility balloons is under-served by the merge table). Reuses
    // the q_bpe_encode per-doc counts; the ratio is integer e4
    // fixed-point, so the per-lang rows replay exactly
    "q_fertility" -> ((s, dir) =>
      queries("q_bpe_encode")(s, dir)
        .join(Tables(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bpe_tokens")).as("sum_tokens"),
          sum(col("n_words")).as("sum_words"))
        .withColumn("fertility_e4",
          expr("sum_tokens * 10000 div sum_words"))),

    // C4 line-level cleaning (LineFilter): the shipped documents
    // carry no newlines, so a 5-line synthetic doc is built
    // deterministically in both engines (text_pii's pattern) — two
    // content lines with terminal punctuation that must survive, a
    // too-short line, a cookie banner, and a brace-bearing code line
    // that must all drop
    "text_clean" -> ((s, dir) => {
      val synth = concat(
        substring(col("text"), 1, 60), lit(".\n"),
        lit("short line\n"),
        lit("We use cookies and javascript on this site.\n"),
        substring(col("text"), 30, 50), lit("!\n"),
        lit("function() { return 0; }"))
      graft.operators.LineFilter(
        Tables(s, dir, "documents").select(col("doc_id"), synth.as("text")),
        "text")
        .select(col("doc_id"), col("clean_text"), col("n_lines"),
          col("n_kept"), col("kept_chars"))
    }),

    // Gopher document-rule table (Rae et al. 2021 App. A): exact
    // integer statistics + the composite keep verdict, all narrow —
    // the doc-level rule stage between C4 line cleaning (text_clean)
    // and model filtering (q_quality_filter). minWords lowered to the
    // fixture's doc scale so the verdict actually splits the corpus.
    "q_gopher_rules" -> ((s, dir) =>
      graft.operators.GopherRules(
        Tables(s, dir, "documents"), "doc_id", "text", minWords = 20)),

    // heavy hitters: Misra-Gries candidate sketch (≤ 64 counters per
    // task, mergeable) + exact second pass — output is the exact set
    // of terms with count·64 > n, independent of sketch internals
    "q_heavy_hitters" -> ((s, dir) =>
      graft.functions.HeavyHitters.frequentTerms(
        Tables(s, dir, "documents"), "text", k = 64)),

    // BM25 ranked retrieval (the query side of q_inverted_index):
    // integer micro-unit per-term scores summed exactly, top-20 with
    // id tiebreak — posting rows crossing the exchanges are bounded
    // by query-term document frequency, never corpus size
    "q_bm25" -> ((s, dir) =>
      graft.operators.Retrieval.bm25(Tables(s, dir, "documents"),
        "doc_id", "text", Seq("spark", "query", "join"))),

    // RM3 pseudo-relevance feedback: score the seed query, lift the
    // 3 most-frequent non-seed terms from the top-5 results, rescore
    // with the expanded query — vocabulary-mismatch recall, the
    // Lucene/Anserini RM3 recipe, deterministic end-to-end (integer
    // scores + exact-count/term-order expansion pick)
    "q_bm25_rm3" -> ((s, dir) =>
      graft.operators.Retrieval.bm25Rm3(Tables(s, dir, "documents"),
        "doc_id", "text", Seq("spark", "query", "join"))),

    // batched BM25 — three queries in one pass: union of terms
    // filters the corpus once, per-query fan-out is a broadcast term
    // join, top-5 per query via the bounded TopK aggregate
    "q_bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val q = Seq((0L, "spark"), (0L, "query"), (0L, "join"),
        (1L, "fast"), (1L, "table"), (2L, "data")).toDF("qid", "term")
      graft.operators.Retrieval.bm25Batch(Tables(s, dir, "documents"),
        "doc_id", "text", q, "qid", "term", topK = 5)
    }),

    // CCNet-style LM perplexity scoring: bigram stupid-backoff model
    // trained on the doc_id % 5 = 0 reference split, every document
    // scored in integer micro-nats (per-token floor before the sum)
    "q_perplexity" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.operators.LanguageModel.bigramNll(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") % 5 === 0), "text")
    }),

    // trigram stupid backoff (Brants et al.) — the recursive-backoff
    // ladder the bigram form can't exercise: trigram ratio, else
    // 0.4 x bigram, else 0.16 x unigram, else unknown
    "q_perplexity3" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.operators.LanguageModel.trigramNll(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") % 5 === 0), "text")
    }),

    // the broadcast-model form of q_perplexity: counts collected into
    // map literals (the pruned-KenLM deployment shape), scoring one
    // narrow stream-safe projection — same arithmetic, same oracle
    "q_perplexity_bcast" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val model = graft.operators.LanguageModel.trainNgrams(
        docs.filter(col("doc_id") % 5 === 0), "text", order = 2)
      graft.operators.LanguageModel.ngramNllNarrow(
        docs, "doc_id", "text", model)
    }),

    // the broadcast-model form of q_perplexity3: trigram maps as
    // literals, scoring one narrow stream-safe projection — same
    // arithmetic, same oracle
    "q_perplexity3_bcast" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val model = graft.operators.LanguageModel.trainNgrams(
        docs.filter(col("doc_id") % 5 === 0), "text", order = 3)
      graft.operators.LanguageModel.ngramNllNarrow(
        docs, "doc_id", "text", model)
    }),

    // order 4 — one step from CCNet's production order-5 KenLM: the
    // shared pruned-count builder grows one table, the backoff
    // recursion one 0.4 multiplier; broadcast-narrow deployment form
    "q_perplexity4_bcast" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val model = graft.operators.LanguageModel.trainNgrams(
        docs.filter(col("doc_id") % 5 === 0), "text", order = 4)
      graft.operators.LanguageModel.ngramNllNarrow(
        docs, "doc_id", "text", model)
    }),

    // order 5 — the CCNet production recipe itself (Wenzek et al.
    // 2020 ship a pruned KenLM 5-gram): the SAME NgramModel type and
    // unrolled scorer as orders 2-4, one more rung on the ladder
    "q_perplexity5_bcast" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val model = graft.operators.LanguageModel.trainNgrams(
        docs.filter(col("doc_id") % 5 === 0), "text", order = 5)
      graft.operators.LanguageModel.ngramNllNarrow(
        docs, "doc_id", "text", model)
    }),

    // Min-K% prob membership/contamination signal (Shi et al. 2023):
    // mean NLL of each document's 20% costliest tokens under the
    // reference bigram model — the pretraining-data membership test;
    // per-token costs from the same broadcast-model fold as
    // q_perplexity_bcast, selection an in-row order statistic
    "q_min_k_prob" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val model = graft.operators.LanguageModel.trainNgrams(
        docs.filter(col("doc_id") % 5 === 0), "text", order = 2)
      graft.operators.LanguageModel.minKProbNll(
        docs, "doc_id", "text", model, kPct = 20)
    }),

    // CCNet §4.3 head/middle/tail corpus partition: NLL terciles as
    // exact integer order statistics (no interpolated percentile —
    // engine-portable by construction)
    "q_ccnet_buckets" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val model = graft.operators.LanguageModel.trainNgrams(
        docs.filter(col("doc_id") % 5 === 0), "text", order = 2)
      graft.operators.LanguageModel.ccnetBuckets(
        docs, "doc_id", "text", model)
    }),

    // hybrid retrieval: BM25 lexical top-20 fused with embedding
    // cosine top-20 (query vector = vec_id 0, the doc_id-aligned
    // embedding table) by reciprocal-rank fusion — all-integer
    // contributions, exact in both engines. The legs carry the
    // corpus-scale work; fusion touches 40 rows.
    "q_rrf" -> ((s, dir) => {
      // constant-key partition: the frame is the bm25 leg's <= topK
      // rows, but an unpartitioned Window.orderBy pattern-matches a
      // scale-killer (and WARNs in every bench tail) — pinning one
      // partition says "bounded by construction" in the plan itself.
      // The key must be NON-FOLDABLE: Catalyst strips a literal
      // partition spec, reinstating the warning — doc_id * 0 survives
      // optimization as a real (constant-valued) key
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id") * 0)
        .orderBy(col("score_e6").desc, col("doc_id").asc)
      val lex = graft.operators.Retrieval.bm25(Tables(s, dir, "documents"),
          "doc_id", "text", Seq("spark", "query", "join"), topK = 20)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select("doc_id", "rank")
      val emb = Tables(s, dir, "embeddings")
      val vec = graft.operators.Similarity.bruteForceTopK(
          emb.filter(col("vec_id") === 0L), emb,
          "vec_id", "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(lex, vec), "doc_id", "rank",
        kRrf = 60, topK = 10)
    }),

    // batched hybrid retrieval: three BM25 queries (the q_bm25_batch
    // table) fused with three vector queries (vec_id 0/1/2) in one
    // plan — bounded TopK per query, all-integer fusion
    "q_rrf_batch" -> ((s, dir) => {
      import s.implicits._
      val q = Seq((0L, "spark"), (0L, "query"), (0L, "join"),
        (1L, "fast"), (1L, "table"), (2L, "data")).toDF("qid", "term")
      val lex = graft.operators.Retrieval.bm25Batch(
          Tables(s, dir, "documents"), "doc_id", "text",
          q, "qid", "term", topK = 10)
        .select(col("qid"), col("doc_id"), col("rank"))
      val emb = Tables(s, dir, "embeddings")
      val vec = graft.operators.Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 3), emb,
          "vec_id", "vec_id", "embedding", k = 10)
        .select(col("query_id").as("qid"),
          col("neighbor_id").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuseBatch(Seq(lex, vec),
        "qid", "doc_id", "rank", kRrf = 60, topK = 5)
        .select(col("qid"), col("doc_id"), col("rrf_e6"), col("rank"))
    }),

    // inverted-index build: term -> document frequency + a content
    // address of the sorted posting list (the artifact a search/recall
    // stage consumes). Distinct (term, doc) then one aggregation.
    "q_inverted_index" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .distinct()
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          md5(concat_ws(",",
            sort_array(collect_list(col("doc_id"))).cast("array<string>")))
            .as("postings_hash"))),

    // HTML main-content extraction (jusText/trafilatura-shaped): the
    // crawl-pipeline stage BEFORE every text operator above — strip
    // script/style/comments, segment at block tags, keep blocks by
    // integer line rules (link density, tag density, stopword share,
    // length). The corpus has no HTML column, so a page is
    // synthesized deterministically in both engines (text_pii's
    // discipline): head + nav + heading + two body paragraphs from
    // the document text + an image row + a related-links list + a
    // footer. The extraction must keep the body prose and drop all
    // chrome. Narrow array expressions, zero shuffle — scan speed.
    "text_extract_html" -> ((s, dir) =>
      graft.operators.HtmlExtract.extract(
          Tables(s, dir, "documents")
            .select(col("doc_id"), synthHtml.as("html")),
          "html")
        .select(col("doc_id"), col("n_blocks"), col("n_kept"),
          col("main_text"), col("main_chars"))),

    // the corpus-wide boilerplate profile over the same pages: blocks
    // per first-failing drop reason with e4 shares — the dial read
    // before loosening/tightening an extraction rule. One explode +
    // one map-combined agg to <= 5 rows.
    "text_boilerplate" -> ((s, dir) =>
      graft.operators.HtmlExtract.profile(
        Tables(s, dir, "documents")
          .select(col("doc_id"), synthHtml.as("html")),
        "html")),

    // outlink extraction over the same pages: one row per anchor in
    // document order — the crawl-frontier / host-graph feed (the
    // per-doc /doc/N link varies, so the edge list is non-degenerate:
    // 50 distinct targets). One explode, no shuffle.
    "text_outlinks" -> ((s, dir) =>
      graft.operators.HtmlExtract.outlinks(
          Tables(s, dir, "documents")
            .select(col("doc_id"), synthHtml.as("html")),
          "html")
        .select(col("doc_id"), col("rank"), col("href"),
          col("anchor"), col("section")))
  )

  /** The deterministic HTML fixture page both engines build from
    * (doc_id, text): realistic chrome (nav/footer/related-links/image
    * row/inline entities) around body paragraphs drawn from the
    * document text. substr past the text's end is '' in both engines,
    * so short documents deterministically lose their second
    * paragraph to the min-words rule. */
  private[queries] def synthHtml =
    concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>.m{color:#333}</style>" +
        "<script type=\"text/javascript\">var t = 1 && document.cookie;" +
        "</script></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/archive\">Archive</a> " +
        "<a href=\"/tags\">Tags</a></nav><h1>"),
      substring(col("text"), 1, 20),
      lit("</h1><p>"), substring(col("text"), 1, 120),
      lit(".</p><p>"), substring(col("text"), 121, 160),
      lit(" &amp; more.</p>" +
        "<p><img src=\"/one.png\"><img src=\"/two.png\">" +
        "<img src=\"/three.png\"> img alt fig</p>" +
        "<ul><li><a href=\"/more\">Read more posts</a></li>" +
        "<li><a href=\"/share\">Share this page</a></li></ul>" +
        "<footer>Copyright 2026 <a href=\"/privacy\">Privacy</a> " +
        "<a href=\"/imprint\">Imprint</a> <a href=\"/doc/"),
      (col("doc_id") % 50).cast("string"),
      lit("\">see doc "), (col("doc_id") % 50).cast("string"),
      lit("</a></footer></body></html>"))

  // q_bpe_train replay: V unrolled rounds. Each round counts
  // adjacent symbol pairs over the word-frequency table (parallel
  // unnest of the shifted slices zips positionally), takes the
  // (cnt desc, l, r) top-1, and applies it greedily via a RECURSIVE
  // first-occurrence rewrite on the space-delimited symbol string:
  // each rewrite deletes exactly one space, so per word the shortest
  // version is the fixpoint — and replace-first-until-none equals the
  // single-pass greedy fold because a fused token (l||r, r non-empty)
  // can never complete a ' l r ' pattern to its left.
  private def bpeChainCtes(v: Int): String = {
    val steps = (0 until v).map { t =>
      s"""w$t AS (SELECT f, string_split(trim(w), ' ') AS t FROM s$t),
         |p$t AS (SELECT f, unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
         |      FROM w$t WHERE len(t) >= 2),
         |c$t AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS cnt FROM p$t GROUP BY l, r),
         |b$t AS MATERIALIZED (SELECT l, r, cnt FROM c$t ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |r$t AS (
         |  SELECT wd, f, w FROM s$t
         |  UNION ALL
         |  SELECT wd, f,
         |    substr(w, 1, pos - 1) || ' ' || ml || mr || ' ' ||
         |      substr(w, pos + length(' ' || ml || ' ' || mr || ' '))
         |  FROM (SELECT wd, f, w,
         |          position((SELECT ' ' || l || ' ' || r || ' ' FROM b$t) IN w) AS pos,
         |          (SELECT l FROM b$t) AS ml, (SELECT r FROM b$t) AS mr
         |        FROM r$t) rr WHERE pos > 0),
         |s${t + 1} AS MATERIALIZED (SELECT wd, f, w FROM (
         |    SELECT wd, f, w,
         |      row_number() OVER (PARTITION BY wd ORDER BY length(w)) AS rn
         |    FROM r$t) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""wf AS MATERIALIZED (
       |  SELECT wd, CAST(count(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS wd
       |    FROM documents) GROUP BY wd),
       |s0 AS MATERIALIZED (SELECT wd, f,
       |         ' ' || regexp_replace(wd, '(.)', '\\1 ', 'g') AS w FROM wf),
       |$steps""".stripMargin
  }

  private def bpeTrainOracle(v: Int): String = {
    val unions = (0 until v).map(t =>
      s"SELECT CAST(${t + 1} AS INTEGER) AS rank, l AS lhs, r AS rhs, cnt FROM b$t")
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE ${bpeChainCtes(v)}
       |$unions""".stripMargin
  }

  // encode replay: the same trained chain, final symbol table s$v,
  // corpus tokens joined to per-word token counts
  private def bpeEncodeOracle(v: Int): String =
    s"""WITH RECURSIVE ${bpeChainCtes(v)},
       |toks AS (SELECT doc_id,
       |           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS wd
       |         FROM documents),
       |seg AS (SELECT wd,
       |          CAST(len(string_split(trim(w), ' ')) AS BIGINT) AS n
       |        FROM s$v)
       |SELECT doc_id,
       |  CAST(sum(seg.n) AS BIGINT) AS n_bpe_tokens,
       |  count(*) AS n_words
       |FROM toks JOIN seg USING (wd)
       |WHERE length(wd) >= 1
       |GROUP BY doc_id""".stripMargin

  // q_fertility replay: the q_bpe_encode per-doc counts (same merge
  // chain) joined to the lang column, per-lang integer sums and the
  // e4 fixed-point ratio
  private def fertilityOracle(v: Int): String =
    s"""WITH RECURSIVE ${bpeChainCtes(v)},
       |toks AS (SELECT doc_id,
       |           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS wd
       |         FROM documents),
       |seg AS (SELECT wd,
       |          CAST(len(string_split(trim(w), ' ')) AS BIGINT) AS n
       |        FROM s$v),
       |perdoc AS (SELECT doc_id,
       |             CAST(sum(seg.n) AS BIGINT) AS n_bpe_tokens,
       |             count(*) AS n_words
       |           FROM toks JOIN seg USING (wd)
       |           WHERE length(wd) >= 1
       |           GROUP BY doc_id)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_bpe_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(n_words) AS BIGINT) AS sum_words,
       |  CAST(sum(n_bpe_tokens) * 10000 // sum(n_words) AS BIGINT)
       |    AS fertility_e4
       |FROM perdoc JOIN documents USING (doc_id)
       |GROUP BY lang""".stripMargin

  // q_perplexity replay: bigram/unigram counts from the reference
  // split, zipped-unnest (prev, cur) pairs, the same CASE ladder with
  // one fixed association, per-token floor to micro-nats. Shared by
  // q_perplexity (join form) and q_perplexity_bcast (broadcast-model
  // form) — same arithmetic, byte-identical result.
  // shared by q_perplexity / q_perplexity_bcast / q_ccnet_buckets:
  // train the bigram model on the doc_id%5 reference slice, score
  // every >= 2-word doc's per-bigram micro-nat costs
  private val perplexityCtes: String =
    """wd AS (SELECT doc_id,
      |              regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      |            FROM documents),
      |wr AS (SELECT ws FROM wd WHERE doc_id % 5 = 0),
      |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
      |          SELECT unnest(ws) AS w FROM wr) GROUP BY w),
      |big AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c12 FROM (
      |          SELECT unnest(ws[1:len(ws)-1]) AS prev,
      |                 unnest(ws[2:len(ws)]) AS cur
      |          FROM wr WHERE len(ws) >= 2) GROUP BY prev, cur),
      |tot AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS total FROM wr),
      |dp AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS prev,
      |         unnest(ws[2:len(ws)]) AS cur
      |       FROM wd WHERE len(ws) >= 2),
      |c AS (SELECT doc_id,
      |        CAST(floor(1000000.0 * (-ln(
      |          CASE WHEN c12 IS NOT NULL
      |                 THEN CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)
      |               WHEN c2 IS NOT NULL
      |                 THEN 0.4 * (CAST(c2 AS DOUBLE) / CAST(total AS DOUBLE))
      |               ELSE 0.4 / (CAST(total AS DOUBLE) * 10.0)
      |          END))) AS BIGINT) AS cost_e6
      |      FROM dp
      |      LEFT JOIN big USING (prev, cur)
      |      LEFT JOIN (SELECT w AS prev, c AS c1 FROM uni) USING (prev)
      |      LEFT JOIN (SELECT w AS cur, c AS c2 FROM uni) USING (cur)
      |      CROSS JOIN tot)""".stripMargin

  private val perplexityOracle: String =
    s"""WITH $perplexityCtes
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
       |  CAST(sum(cost_e6) AS BIGINT) AS nll_e6,
       |  CAST(sum(cost_e6) // count(*) AS BIGINT) AS avg_nll_e6
       |FROM c GROUP BY doc_id""".stripMargin

  // q_curriculum_order replay: the same per-token cost CTE folded to
  // per-doc average NLL, floor-stepped difficulty buckets, ascending
  // cumulative windows over the bucket histogram, e4 token shares
  private val curriculumOracle: String =
    s"""WITH $perplexityCtes,
       |px AS (SELECT doc_id,
       |         CAST(sum(cost_e6) // count(*) AS BIGINT) AS avg_nll_e6
       |       FROM c GROUP BY doc_id),
       |tk AS (SELECT doc_id,
       |         CAST(len(regexp_extract_all(text,
       |           '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tok
       |       FROM documents),
       |hsrc AS (SELECT (px.avg_nll_e6 // $CURR_STEP) * $CURR_STEP
       |           AS difficulty_e6, tk.n_tok
       |         FROM px JOIN tk USING (doc_id)),
       |h AS (SELECT difficulty_e6, CAST(count(*) AS BIGINT) AS n_docs,
       |        CAST(sum(n_tok) AS BIGINT) AS sum_tok
       |      FROM hsrc GROUP BY 1),
       |t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tt FROM hsrc),
       |c2 AS (SELECT difficulty_e6, n_docs, sum_tok,
       |        CAST(sum(n_docs) OVER (ORDER BY difficulty_e6 ASC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS BIGINT) AS cum_docs,
       |        CAST(sum(sum_tok) OVER (ORDER BY difficulty_e6 ASC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS BIGINT) AS cum_tok
       |      FROM h)
       |SELECT c2.difficulty_e6, c2.n_docs, c2.sum_tok, c2.cum_docs,
       |  c2.cum_tok, CAST(c2.cum_tok * 10000 // t.tt AS BIGINT)
       |    AS tok_share_e4
       |FROM c2, t""".stripMargin

  // q_domain_reweight replay: the same per-token cost CTE folded to
  // per-doc average NLL, per-source aggregation, the corpus-mean
  // scalar, then the linearized integer update — every division has
  // nonnegative operands (`//` == `div`) and greatest/coalesce skip
  // NULLs identically in both engines, so unscored sources replay as
  // excess 0, never NULL
  private val domainReweightOracle: String =
    s"""WITH $perplexityCtes,
       |px AS (SELECT doc_id,
       |         CAST(sum(cost_e6) // count(*) AS BIGINT) AS avg_nll_e6
       |       FROM c GROUP BY doc_id),
       |tk AS (SELECT doc_id, source,
       |         CAST(len(regexp_extract_all(text,
       |           '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tok
       |       FROM documents),
       |j AS (SELECT tk.source, tk.n_tok, px.avg_nll_e6
       |      FROM tk LEFT JOIN px USING (doc_id)),
       |dom AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |          CAST(count(avg_nll_e6) AS BIGINT) AS n_scored,
       |          CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       |          sum(avg_nll_e6) AS sum_nll
       |        FROM j GROUP BY source),
       |g2 AS (SELECT CASE WHEN sum(n_scored) > 0
       |           THEN sum(sum_nll) // sum(n_scored) END AS g_e6,
       |         sum(sum_tok) AS tt FROM dom),
       |e AS (SELECT d.source, d.n_docs, d.n_scored, d.sum_tok,
       |        CASE WHEN d.n_scored > 0
       |          THEN d.sum_nll // d.n_scored END AS mean_nll_e6,
       |        coalesce(greatest(
       |          (CASE WHEN d.n_scored > 0
       |             THEN d.sum_nll // d.n_scored END) - g2.g_e6,
       |          0), 0) AS excess_e6,
       |        CASE WHEN g2.tt > 0
       |          THEN d.sum_tok * 1000000 // g2.tt
       |          ELSE 0 END AS base_share_e6
       |      FROM dom d, g2),
       |w AS (SELECT *,
       |        base_share_e6 * (1000000 + $DR_ETA * excess_e6) AS wgt
       |      FROM e),
       |sw AS (SELECT sum(wgt) AS s FROM w)
       |SELECT w.source, w.n_docs, w.n_scored, w.sum_tok,
       |  CAST(w.mean_nll_e6 AS BIGINT) AS mean_nll_e6,
       |  CAST(w.excess_e6 AS BIGINT) AS excess_e6,
       |  CAST(w.base_share_e6 AS BIGINT) AS base_share_e6,
       |  CAST(CASE WHEN sw.s > 0 THEN w.wgt * 10000 // sw.s
       |       ELSE 0 END AS BIGINT) AS new_share_e4
       |FROM w, sw""".stripMargin

  // q_k_anonymity replay: quasi-identifier class sizes, then the
  // k-distribution — pure integer grouping
  private val kAnonymityOracle: String =
    s"""WITH q AS (SELECT source, lang,
       |    len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS nw
       |  FROM documents),
       |g AS (SELECT source, lang, nw - (nw % 10) AS len_bucket,
       |        CAST(count(*) AS BIGINT) AS k
       |      FROM q GROUP BY 1, 2, 3)
       |SELECT k, CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(sum(k) AS BIGINT) AS n_docs,
       |  CAST(CASE WHEN k < $K_MIN THEN 1 ELSE 0 END AS INTEGER) AS at_risk
       |FROM g GROUP BY k""".stripMargin

  // q_l_diversity replay: distinct-sensitive count per quasi-id
  // class, then the class histogram over l — same shape as the
  // k-anonymity replay with count(DISTINCT source) as the metric
  private val lDiversityOracle: String =
    s"""WITH q AS (SELECT source, lang,
       |    len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS nw
       |  FROM documents),
       |g AS (SELECT lang, nw - (nw % 10) AS len_bucket,
       |        CAST(count(DISTINCT source) AS BIGINT) AS l,
       |        CAST(count(*) AS BIGINT) AS n
       |      FROM q GROUP BY 1, 2)
       |SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(sum(n) AS BIGINT) AS n_docs,
       |  CAST(CASE WHEN l < $L_MIN THEN 1 ELSE 0 END AS INTEGER) AS at_risk
       |FROM g GROUP BY l""".stripMargin

  // q_t_closeness replay: per-class exact-e6 total-variation distance
  // to the corpus sensitive distribution over the common denominator
  // n_c*n; the absent-value tail collapses to (n - sv)*n_c. Integer
  // // on nonnegative operands == Spark's div.
  private val tClosenessOracle: String =
    s"""WITH q AS (SELECT source, lang,
       |    len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS nw
       |  FROM documents),
       |q2 AS (SELECT lang, nw - (nw % 10) AS len_bucket, source FROM q),
       |cv AS (SELECT lang, len_bucket, source,
       |         CAST(count(*) AS BIGINT) AS n_cv
       |       FROM q2 GROUP BY 1, 2, 3),
       |vt AS (SELECT source, CAST(sum(n_cv) AS BIGINT) AS n_v
       |       FROM cv GROUP BY 1),
       |cls AS (SELECT lang, len_bucket, CAST(sum(n_cv) AS BIGINT) AS n_c
       |        FROM cv GROUP BY 1, 2),
       |n AS (SELECT CAST(sum(n_cv) AS BIGINT) AS nn FROM cv),
       |s AS (SELECT cv.lang, cv.len_bucket,
       |        CAST(sum(abs(cv.n_cv * n.nn - vt.n_v * cls.n_c)) AS BIGINT)
       |          AS s1,
       |        CAST(sum(vt.n_v) AS BIGINT) AS sv,
       |        max(cls.n_c) AS n_c, max(n.nn) AS nn
       |      FROM cv JOIN vt USING (source)
       |        JOIN cls USING (lang, len_bucket) CROSS JOIN n
       |      GROUP BY 1, 2),
       |d AS (SELECT ((s1 + (nn - sv) * n_c) * 500000) // (n_c * nn) AS d_e6,
       |        n_c FROM s),
       |b AS (SELECT d_e6 - (d_e6 % 100000) AS d_bucket_e6, n_c FROM d)
       |SELECT d_bucket_e6, CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(sum(n_c) AS BIGINT) AS n_docs,
       |  CAST(CASE WHEN d_bucket_e6 >= $T_MAX_E6 THEN 1 ELSE 0 END
       |    AS INTEGER) AS at_risk
       |FROM b GROUP BY 1""".stripMargin

  // q_readability replay: every term floored separately on
  // nonnegative operands (`//` == `div`); the grade clamps BEFORE
  // its division so the operand stays nonnegative (the engines only
  // agree on integer division >= 0); regexp_replace needs the 'g'
  // flag in DuckDB (Spark replaces all matches by default)
  private val readabilityOracle: String =
    """WITH b AS (SELECT doc_id,
      |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
      |      AS n_chars,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
      |      AS n_words,
      |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
      |      AS BIGINT) AS n_sents
      |  FROM documents),
      |a AS (SELECT *, CAST((471 * n_chars) // n_words
      |        + (50 * n_words) // n_sents - 2143 AS BIGINT) AS ari_e2
      |      FROM b)
      |SELECT doc_id, n_chars, n_words, n_sents, ari_e2,
      |  CAST(least(greatest(ari_e2, 100) // 100, 14) AS BIGINT) AS grade
      |FROM a""".stripMargin

  // q_excess_loss replay: the perplexity cost ladder instantiated
  // TWICE (reference-split model r*, whole-corpus model t*) over one
  // shared pairs explode; the averages are integer divisions on
  // nonnegative sums (`//` == `div`) and the excess is an integer
  // subtraction — exact in both engines
  private val excessLossOracle: String =
    """WITH wd AS (SELECT doc_id,
      |              regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      |            FROM documents),
      |wr AS (SELECT ws FROM wd WHERE doc_id % 5 = 0),
      |unir AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
      |           SELECT unnest(ws) AS w FROM wr) GROUP BY w),
      |bigr AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c12 FROM (
      |           SELECT unnest(ws[1:len(ws)-1]) AS prev,
      |                  unnest(ws[2:len(ws)]) AS cur
      |           FROM wr WHERE len(ws) >= 2) GROUP BY prev, cur),
      |totr AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS totalr FROM wr),
      |unit AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
      |           SELECT unnest(ws) AS w FROM wd) GROUP BY w),
      |bigt AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c12 FROM (
      |           SELECT unnest(ws[1:len(ws)-1]) AS prev,
      |                  unnest(ws[2:len(ws)]) AS cur
      |           FROM wd WHERE len(ws) >= 2) GROUP BY prev, cur),
      |tott AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS totalt FROM wd),
      |dp AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS prev,
      |         unnest(ws[2:len(ws)]) AS cur
      |       FROM wd WHERE len(ws) >= 2),
      |c AS (SELECT doc_id,
      |        CAST(floor(1000000.0 * (-ln(
      |          CASE WHEN r12 IS NOT NULL
      |                 THEN CAST(r12 AS DOUBLE) / CAST(r1 AS DOUBLE)
      |               WHEN r2 IS NOT NULL
      |                 THEN 0.4 * (CAST(r2 AS DOUBLE) / CAST(totalr AS DOUBLE))
      |               ELSE 0.4 / (CAST(totalr AS DOUBLE) * 10.0)
      |          END))) AS BIGINT) AS cost_r,
      |        CAST(floor(1000000.0 * (-ln(
      |          CASE WHEN t12 IS NOT NULL
      |                 THEN CAST(t12 AS DOUBLE) / CAST(t1 AS DOUBLE)
      |               WHEN t2 IS NOT NULL
      |                 THEN 0.4 * (CAST(t2 AS DOUBLE) / CAST(totalt AS DOUBLE))
      |               ELSE 0.4 / (CAST(totalt AS DOUBLE) * 10.0)
      |          END))) AS BIGINT) AS cost_t
      |      FROM dp
      |      LEFT JOIN (SELECT prev, cur, c12 AS r12 FROM bigr)
      |        USING (prev, cur)
      |      LEFT JOIN (SELECT w AS prev, c AS r1 FROM unir) USING (prev)
      |      LEFT JOIN (SELECT w AS cur, c AS r2 FROM unir) USING (cur)
      |      LEFT JOIN (SELECT prev, cur, c12 AS t12 FROM bigt)
      |        USING (prev, cur)
      |      LEFT JOIN (SELECT w AS prev, c AS t1 FROM unit) USING (prev)
      |      LEFT JOIN (SELECT w AS cur, c AS t2 FROM unit) USING (cur)
      |      CROSS JOIN totr CROSS JOIN tott)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
      |  CAST(sum(cost_t) AS BIGINT) AS train_nll_e6,
      |  CAST(sum(cost_r) AS BIGINT) AS ref_nll_e6,
      |  CAST((sum(cost_t) // count(*)) - (sum(cost_r) // count(*))
      |    AS BIGINT) AS excess_e6,
      |  CAST(CASE WHEN (sum(cost_t) // count(*)) -
      |                 (sum(cost_r) // count(*)) > 0
      |       THEN 1 ELSE 0 END AS INTEGER) AS selected
      |FROM c GROUP BY doc_id""".stripMargin

  // q_min_k_prob replay: the same per-token cost CTE, then the
  // order statistic as a windowed rank — rank the costs per doc
  // descending, sum the first k_used = max(1, n*20//100), integer
  // mean. Ties at the cut boundary are equal VALUES, so any rank
  // order among them sums identically — deterministic despite the
  // arbitrary tie order.
  private val minKProbOracle: String =
    s"""WITH $perplexityCtes,
       |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored
       |      FROM c GROUP BY 1),
       |m AS (SELECT doc_id, n_scored,
       |        greatest(1, (n_scored * 20) // 100) AS k_used FROM n),
       |r AS (SELECT doc_id, cost_e6, row_number() OVER (
       |        PARTITION BY doc_id ORDER BY cost_e6 DESC) AS rn FROM c),
       |t AS (SELECT r.doc_id, sum(cost_e6) AS s
       |      FROM r JOIN m USING (doc_id) WHERE rn <= k_used GROUP BY 1)
       |SELECT m.doc_id, m.n_scored, CAST(m.k_used AS BIGINT) AS k_used,
       |  CAST(t.s // m.k_used AS BIGINT) AS min_k_avg_nll_e6
       |FROM m JOIN t USING (doc_id)""".stripMargin

  // q_perplexity3 replay: the same uni/big tables plus the trigram
  // count, the recursive CASE ladder with one fixed association per
  // branch (ratio parenthesized before the 0.4^k multiplier,
  // matching the Spark column expression), per-token floor
  private val perplexity3Oracle: String =
    s"""WITH $perplexityCtes,
       |tri AS (SELECT p2, p1, cur, CAST(count(*) AS BIGINT) AS c123 FROM (
       |          SELECT unnest(ws[1:len(ws)-2]) AS p2,
       |                 unnest(ws[2:len(ws)-1]) AS p1,
       |                 unnest(ws[3:len(ws)]) AS cur
       |          FROM wr WHERE len(ws) >= 3) GROUP BY p2, p1, cur),
       |dp3 AS (SELECT doc_id, unnest(ws[1:len(ws)-2]) AS p2,
       |          unnest(ws[2:len(ws)-1]) AS p1,
       |          unnest(ws[3:len(ws)]) AS cur
       |        FROM wd WHERE len(ws) >= 3),
       |c3 AS (SELECT doc_id,
       |        CAST(floor(1000000.0 * (-ln(
       |          CASE WHEN tri.c123 IS NOT NULL
       |                 THEN CAST(tri.c123 AS DOUBLE) / CAST(bc.cctx AS DOUBLE)
       |               WHEN bb.c12b IS NOT NULL
       |                 THEN 0.4 * (CAST(bb.c12b AS DOUBLE) / CAST(u1.c1 AS DOUBLE))
       |               WHEN u2.c2 IS NOT NULL
       |                 THEN 0.16 * (CAST(u2.c2 AS DOUBLE) / CAST(total AS DOUBLE))
       |               ELSE 0.16 / (CAST(total AS DOUBLE) * 10.0)
       |          END))) AS BIGINT) AS cost_e6
       |      FROM dp3
       |      LEFT JOIN tri ON tri.p2 = dp3.p2 AND tri.p1 = dp3.p1
       |                   AND tri.cur = dp3.cur
       |      LEFT JOIN (SELECT prev, cur, c12 AS cctx FROM big) bc
       |        ON bc.prev = dp3.p2 AND bc.cur = dp3.p1
       |      LEFT JOIN (SELECT prev, cur, c12 AS c12b FROM big) bb
       |        ON bb.prev = dp3.p1 AND bb.cur = dp3.cur
       |      LEFT JOIN (SELECT w, c AS c1 FROM uni) u1 ON u1.w = dp3.p1
       |      LEFT JOIN (SELECT w, c AS c2 FROM uni) u2 ON u2.w = dp3.cur
       |      CROSS JOIN tot)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
       |  CAST(sum(cost_e6) AS BIGINT) AS nll_e6,
       |  CAST(sum(cost_e6) // count(*) AS BIGINT) AS avg_nll_e6
       |FROM c3 GROUP BY doc_id""".stripMargin

  // q_perplexity4_bcast replay: the trigram ladder one level up —
  // a 4-gram count table, the context-trigram denominator, and one
  // more 0.4 multiplier per backoff step; association per branch
  // matches the Scala scorer exactly
  private val perplexity4Oracle: String =
    s"""WITH $perplexityCtes,
       |tri AS (SELECT p2, p1, cur, CAST(count(*) AS BIGINT) AS c123 FROM (
       |          SELECT unnest(ws[1:len(ws)-2]) AS p2,
       |                 unnest(ws[2:len(ws)-1]) AS p1,
       |                 unnest(ws[3:len(ws)]) AS cur
       |          FROM wr WHERE len(ws) >= 3) GROUP BY p2, p1, cur),
       |four AS (SELECT p3, p2, p1, cur, CAST(count(*) AS BIGINT) AS c1234 FROM (
       |          SELECT unnest(ws[1:len(ws)-3]) AS p3,
       |                 unnest(ws[2:len(ws)-2]) AS p2,
       |                 unnest(ws[3:len(ws)-1]) AS p1,
       |                 unnest(ws[4:len(ws)]) AS cur
       |          FROM wr WHERE len(ws) >= 4) GROUP BY p3, p2, p1, cur),
       |dp4 AS (SELECT doc_id, unnest(ws[1:len(ws)-3]) AS p3,
       |          unnest(ws[2:len(ws)-2]) AS p2,
       |          unnest(ws[3:len(ws)-1]) AS p1,
       |          unnest(ws[4:len(ws)]) AS cur
       |        FROM wd WHERE len(ws) >= 4),
       |c4 AS (SELECT doc_id,
       |        CAST(floor(1000000.0 * (-ln(
       |          CASE WHEN four.c1234 IS NOT NULL
       |                 THEN CAST(four.c1234 AS DOUBLE) / CAST(tc.tctx AS DOUBLE)
       |               WHEN tb.c123b IS NOT NULL
       |                 THEN 0.4 * (CAST(tb.c123b AS DOUBLE) / CAST(bc.cctx AS DOUBLE))
       |               WHEN bb.c12b IS NOT NULL
       |                 THEN 0.16 * (CAST(bb.c12b AS DOUBLE) / CAST(u1.c1 AS DOUBLE))
       |               WHEN u2.c2 IS NOT NULL
       |                 THEN 0.064 * (CAST(u2.c2 AS DOUBLE) / CAST(total AS DOUBLE))
       |               ELSE 0.064 / (CAST(total AS DOUBLE) * 10.0)
       |          END))) AS BIGINT) AS cost_e6
       |      FROM dp4
       |      LEFT JOIN four ON four.p3 = dp4.p3 AND four.p2 = dp4.p2
       |                    AND four.p1 = dp4.p1 AND four.cur = dp4.cur
       |      LEFT JOIN (SELECT p2, p1, cur, c123 AS tctx FROM tri) tc
       |        ON tc.p2 = dp4.p3 AND tc.p1 = dp4.p2 AND tc.cur = dp4.p1
       |      LEFT JOIN (SELECT p2, p1, cur, c123 AS c123b FROM tri) tb
       |        ON tb.p2 = dp4.p2 AND tb.p1 = dp4.p1 AND tb.cur = dp4.cur
       |      LEFT JOIN (SELECT prev, cur, c12 AS cctx FROM big) bc
       |        ON bc.prev = dp4.p2 AND bc.cur = dp4.p1
       |      LEFT JOIN (SELECT prev, cur, c12 AS c12b FROM big) bb
       |        ON bb.prev = dp4.p1 AND bb.cur = dp4.cur
       |      LEFT JOIN (SELECT w, c AS c1 FROM uni) u1 ON u1.w = dp4.p1
       |      LEFT JOIN (SELECT w, c AS c2 FROM uni) u2 ON u2.w = dp4.cur
       |      CROSS JOIN tot)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
       |  CAST(sum(cost_e6) AS BIGINT) AS nll_e6,
       |  CAST(sum(cost_e6) // count(*) AS BIGINT) AS avg_nll_e6
       |FROM c4 GROUP BY doc_id""".stripMargin

  // q_perplexity5_bcast replay: CCNet/KenLM's production order — the
  // 4-gram ladder one level up (5-gram table, 4-gram context
  // denominator, multipliers 1 / 0.4 / 0.16 / 0.064 / 0.0256 and
  // unknown 0.0256/(total·10), all decimal literals matching the
  // scorer's BackoffMult table); association per branch matches the
  // one unrolled Scala scorer. Unpruned tables are consistency-
  // complete by construction, so the plain count CTEs replay the
  // trained model exactly (same argument as orders 3-4).
  private val perplexity5Oracle: String =
    s"""WITH $perplexityCtes,
       |tri AS (SELECT p2, p1, cur, CAST(count(*) AS BIGINT) AS c123 FROM (
       |          SELECT unnest(ws[1:len(ws)-2]) AS p2,
       |                 unnest(ws[2:len(ws)-1]) AS p1,
       |                 unnest(ws[3:len(ws)]) AS cur
       |          FROM wr WHERE len(ws) >= 3) GROUP BY p2, p1, cur),
       |four AS (SELECT q1, q2, q3, q4, CAST(count(*) AS BIGINT) AS c1234 FROM (
       |          SELECT unnest(ws[1:len(ws)-3]) AS q1,
       |                 unnest(ws[2:len(ws)-2]) AS q2,
       |                 unnest(ws[3:len(ws)-1]) AS q3,
       |                 unnest(ws[4:len(ws)]) AS q4
       |          FROM wr WHERE len(ws) >= 4) GROUP BY q1, q2, q3, q4),
       |five AS (SELECT q1, q2, q3, q4, q5, CAST(count(*) AS BIGINT) AS c12345 FROM (
       |          SELECT unnest(ws[1:len(ws)-4]) AS q1,
       |                 unnest(ws[2:len(ws)-3]) AS q2,
       |                 unnest(ws[3:len(ws)-2]) AS q3,
       |                 unnest(ws[4:len(ws)-1]) AS q4,
       |                 unnest(ws[5:len(ws)]) AS q5
       |          FROM wr WHERE len(ws) >= 5) GROUP BY q1, q2, q3, q4, q5),
       |dp5 AS (SELECT doc_id, unnest(ws[1:len(ws)-4]) AS p4,
       |          unnest(ws[2:len(ws)-3]) AS p3,
       |          unnest(ws[3:len(ws)-2]) AS p2,
       |          unnest(ws[4:len(ws)-1]) AS p1,
       |          unnest(ws[5:len(ws)]) AS cur
       |        FROM wd WHERE len(ws) >= 5),
       |c5 AS (SELECT doc_id,
       |        CAST(floor(1000000.0 * (-ln(
       |          CASE WHEN fv.c12345 IS NOT NULL
       |                 THEN CAST(fv.c12345 AS DOUBLE) / CAST(fc.fctx AS DOUBLE)
       |               WHEN fb.c1234b IS NOT NULL
       |                 THEN 0.4 * (CAST(fb.c1234b AS DOUBLE) / CAST(tc.tctx AS DOUBLE))
       |               WHEN tb.c123b IS NOT NULL
       |                 THEN 0.16 * (CAST(tb.c123b AS DOUBLE) / CAST(bc.cctx AS DOUBLE))
       |               WHEN bb.c12b IS NOT NULL
       |                 THEN 0.064 * (CAST(bb.c12b AS DOUBLE) / CAST(u1.c1 AS DOUBLE))
       |               WHEN u2.c2 IS NOT NULL
       |                 THEN 0.0256 * (CAST(u2.c2 AS DOUBLE) / CAST(total AS DOUBLE))
       |               ELSE 0.0256 / (CAST(total AS DOUBLE) * 10.0)
       |          END))) AS BIGINT) AS cost_e6
       |      FROM dp5
       |      LEFT JOIN five fv ON fv.q1 = dp5.p4 AND fv.q2 = dp5.p3
       |        AND fv.q3 = dp5.p2 AND fv.q4 = dp5.p1 AND fv.q5 = dp5.cur
       |      LEFT JOIN (SELECT q1, q2, q3, q4, c1234 AS fctx FROM four) fc
       |        ON fc.q1 = dp5.p4 AND fc.q2 = dp5.p3 AND fc.q3 = dp5.p2
       |        AND fc.q4 = dp5.p1
       |      LEFT JOIN (SELECT q1, q2, q3, q4, c1234 AS c1234b FROM four) fb
       |        ON fb.q1 = dp5.p3 AND fb.q2 = dp5.p2 AND fb.q3 = dp5.p1
       |        AND fb.q4 = dp5.cur
       |      LEFT JOIN (SELECT p2, p1, cur, c123 AS tctx FROM tri) tc
       |        ON tc.p2 = dp5.p3 AND tc.p1 = dp5.p2 AND tc.cur = dp5.p1
       |      LEFT JOIN (SELECT p2, p1, cur, c123 AS c123b FROM tri) tb
       |        ON tb.p2 = dp5.p2 AND tb.p1 = dp5.p1 AND tb.cur = dp5.cur
       |      LEFT JOIN (SELECT prev, cur, c12 AS cctx FROM big) bc
       |        ON bc.prev = dp5.p2 AND bc.cur = dp5.p1
       |      LEFT JOIN (SELECT prev, cur, c12 AS c12b FROM big) bb
       |        ON bb.prev = dp5.p1 AND bb.cur = dp5.cur
       |      LEFT JOIN (SELECT w, c AS c1 FROM uni) u1 ON u1.w = dp5.p1
       |      LEFT JOIN (SELECT w, c AS c2 FROM uni) u2 ON u2.w = dp5.cur
       |      CROSS JOIN tot)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
       |  CAST(sum(cost_e6) AS BIGINT) AS nll_e6,
       |  CAST(sum(cost_e6) // count(*) AS BIGINT) AS avg_nll_e6
       |FROM c5 GROUP BY doc_id""".stripMargin

  // ccnet replay: per-doc averages, value histogram, cumulative
  // count, order-statistic terciles, CASE bucket — all integer
  private val ccnetBucketsOracle: String =
    s"""WITH $perplexityCtes,
       |sc AS (SELECT doc_id,
       |         CAST(sum(cost_e6) // count(*) AS BIGINT) AS avg_nll_e6
       |       FROM c GROUP BY doc_id),
       |h AS (SELECT avg_nll_e6, count(*) AS hc FROM sc GROUP BY 1),
       |cu AS (SELECT avg_nll_e6, sum(hc) OVER (ORDER BY avg_nll_e6
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |       FROM h),
       |n AS (SELECT count(*) AS n FROM sc),
       |t AS (SELECT min(CASE WHEN cum * 3 >= n THEN avg_nll_e6 END) AS t1,
       |             min(CASE WHEN cum * 3 >= 2 * n THEN avg_nll_e6 END) AS t2
       |      FROM cu CROSS JOIN n)
       |SELECT doc_id, avg_nll_e6,
       |  CASE WHEN avg_nll_e6 <= t1 THEN 'head'
       |       WHEN avg_nll_e6 <= t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM sc CROSS JOIN t""".stripMargin

  // text_decontaminate_semantic oracle: the cosine's dot products
  // expand to explicit left-associated element sums (the
  // embeddingLshOracle technique) so the DOUBLES equal Spark's
  // left-to-right kernel bit-for-bit — list_cosine_similarity /
  // list_dot_product sum in a different order, and a last-ulp
  // difference at a .00005 boundary flips the round6-then-round4
  // value (observed at sf0.1). Norms precompute per row.
  private val decontaminateSemanticOracle: String = {
    def dot(a: String, b: String): String =
      (1 to 64).map(i => s"$a[$i]*$b[$i]").mkString(" + ")
    s"""WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |           FROM embeddings),
       |n AS (SELECT vec_id, e, ${dot("e", "e")} AS sq FROM q),
       |ev AS (SELECT e, sq FROM n WHERE vec_id % 97 = 0),
       |tr AS (SELECT vec_id, e, sq FROM n WHERE vec_id % 97 <> 0),
       |s AS (SELECT tr.vec_id,
       |        round((${dot("tr.e", "ev.e")}) /
       |          sqrt(tr.sq * ev.sq), 6) AS sim
       |      FROM tr JOIN ev ON true),
       |h AS (SELECT vec_id, count(*) AS n_close, max(sim) AS mx
       |      FROM s WHERE sim >= 0.3 GROUP BY 1)
       |SELECT tr.vec_id, CAST(coalesce(h.n_close, 0) AS BIGINT) AS n_close,
       |  h.mx AS max_sim
       |FROM tr LEFT JOIN h USING (vec_id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_bpe_train" -> bpeTrainOracle(8),
    "q_bpe_encode" -> bpeEncodeOracle(8),
    "q_fertility" -> fertilityOracle(8),
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin,
    // text_entropy replay: same sorted-distinct counts, same
    // c·ln c terms, same LEFT-fold order from a 0.0 seed (0 + x = x
    // exactly, so the prepend mirrors Spark's aggregate initial
    // value bit-for-bit), same (ln(n)·n − s)·10000/n op order
    "text_entropy" ->
      """WITH cs AS (SELECT doc_id, length(text) AS n,
        |      list_transform(range(1, length(text) + 1), i -> text[i]) AS c
        |    FROM documents),
        |d AS (SELECT doc_id, n, c,
        |        list_sort(list_distinct(c)) AS dc FROM cs),
        |t AS (SELECT doc_id, n, len(dc) AS n_uniq,
        |        list_transform(
        |          list_transform(dc,
        |            x -> CAST(len(list_filter(c, y -> y = x)) AS DOUBLE)),
        |          cc -> cc * ln(cc)) AS terms
        |      FROM d)
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_chars,
        |  CAST(CASE WHEN n >= 1 THEN n_uniq ELSE 0 END AS BIGINT) AS n_uniq,
        |  CAST(CASE WHEN n >= 1 THEN floor(
        |      (ln(CAST(n AS DOUBLE)) * CAST(n AS DOUBLE)
        |       - list_reduce(list_prepend(CAST(0 AS DOUBLE), terms),
        |                     (a, b) -> a + b))
        |      * 10000 / CAST(n AS DOUBLE))
        |    ELSE 0 END AS BIGINT) AS entropy_e4
        |FROM t""".stripMargin,
    "text_quality" -> {
      val sw = sqlStopwords("en")
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_words,
        |    CAST(len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')), SW)) AS DOUBLE) AS hits,
        |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(floor((hits / n_words) * 10000) AS BIGINT) AS stopword_ratio_e4,
        |  CAST(floor((alpha / n_chars) * 10000) AS BIGINT) AS alpha_ratio_e4,
        |  CAST(floor((0.4 * (hits / n_words) + 0.3 * least(n_words / 50.0, 1.0)
        |        + 0.3 * (alpha / n_chars)) * 10000) AS BIGINT) AS quality_e4
        |FROM m""".stripMargin.replace("SW", sw)
    },
    "q_source_reputation" -> sourceReputationSql(filtered = false),
    "q_source_filter" -> sourceReputationSql(filtered = true),
    "text_langid" -> {
      val hits = Seq("en", "de", "es", "fr").map { l =>
        s"CAST(len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')), ${sqlStopwords(l)})) AS INTEGER) AS h_$l"
      }.mkString(",\n    ")
      s"""WITH m AS (
         |  SELECT doc_id,
         |    $hits
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN h_en + h_de + h_es + h_fr = 0 THEN 'unknown'
         |       WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
         |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
         |       WHEN h_es >= h_en AND h_es >= h_de AND h_es >= h_fr THEN 'es'
         |       WHEN h_fr >= h_en AND h_fr >= h_de AND h_fr >= h_es THEN 'fr'
         |       ELSE 'unknown' END AS lang_guess
         |FROM m""".stripMargin
    },
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS fp
        |FROM documents""".stripMargin,
    "text_winnow" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS wl
        |           FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(wl) >= 3 THEN
        |           list_transform(range(1, len(wl) - 1),
        |             i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])
        |         ELSE CAST([] AS VARCHAR[]) END AS s
        |       FROM w),
        |hs AS (SELECT doc_id,
        |         list_transform(s, x ->
        |           CAST('0x' || substring(md5(x), 1, 12) AS BIGINT)) AS h
        |       FROM sh),
        |m AS (SELECT doc_id,
        |        CASE WHEN len(h) = 0 THEN CAST([] AS BIGINT[])
        |             ELSE list_transform(range(1, greatest(len(h) - 4, 0) + 2),
        |                    p -> list_min(h[p:p+3]))
        |        END AS mins
        |      FROM hs)
        |SELECT doc_id,
        |  CAST(len(list_distinct(mins)) AS BIGINT) AS n_prints,
        |  md5(array_to_string(list_sort(list_distinct(mins)), ',')) AS fp
        |FROM m""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf,
        |        CAST(floor(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 10000) AS BIGINT)
        |          AS tfidf_e4
        |      FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT s.*, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf_e4 DESC, term ASC) AS rank FROM s)
        |SELECT doc_id, term, tf, tfidf_e4, rank FROM r WHERE rank <= 3""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(
        |    regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS dup_key,
        |  CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS cnt
        |FROM documents GROUP BY 1""".stripMargin,
    "text_pii" ->
      """WITH s AS (SELECT doc_id,
        |    substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com or +1-555-01'
        |      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' today' AS synth
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(synth,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\-]{6,}', '<PHONE>', 'g') AS masked
        |FROM s""".stripMargin,
    "text_normalize" ->
      """WITH s AS (SELECT doc_id,
        |    substr(text, 1, 20) || ' cafe' || chr(769) || ' fin' AS synth
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(synth) AS BIGINT) AS n_before,
        |  CAST(length(nfc_normalize(synth)) AS BIGINT) AS n_after,
        |  nfc_normalize(synth) AS normalized
        |FROM s""".stripMargin,
    "text_filter" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS wc,
        |    CAST(len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT) AS dw,
        |    n_chars
        |  FROM documents),
        |e AS (SELECT doc_id, wc,
        |    CAST(floor(CAST(n_chars AS DOUBLE) / wc * 10000) AS BIGINT) AS cpw_e4,
        |    CAST(floor(CAST(dw AS DOUBLE) / wc * 10000) AS BIGINT) AS div_e4
        |  FROM m)
        |SELECT doc_id, wc, cpw_e4, div_e4,
        |  CASE WHEN wc < 30 THEN 'too_short'
        |       WHEN wc > 300 THEN 'too_long'
        |       WHEN cpw_e4 > 80000 THEN 'long_words'
        |       WHEN div_e4 < 3000 THEN 'low_diversity'
        |       ELSE 'ok' END AS reason,
        |  CAST(CASE WHEN wc >= 30 AND wc <= 300 AND cpw_e4 <= 80000
        |            AND div_e4 >= 3000 THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM e""".stripMargin,
    "text_repetition" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS wl
        |           FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(wl) >= 2 THEN
        |          list_transform(range(1, len(wl)), i -> wl[i] || ' ' || wl[i+1])
        |        ELSE CAST([] AS VARCHAR[]) END AS bg,
        |        CASE WHEN len(wl) >= 3 THEN
        |          list_transform(range(1, len(wl) - 1),
        |            i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])
        |        ELSE CAST([] AS VARCHAR[]) END AS tri
        |      FROM w),
        |base AS (SELECT doc_id, bg, CAST(len(bg) AS BIGINT) AS n_bigrams,
        |           CAST(len(tri) AS BIGINT) AS n_tri,
        |           CAST(len(list_distinct(tri)) AS BIGINT) AS d_tri
        |         FROM g),
        |ex AS (SELECT doc_id, unnest(bg) AS b FROM g),
        |cnt AS (SELECT doc_id, b, count(*) AS c FROM ex GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) AS top_cnt FROM cnt GROUP BY 1),
        |r AS (SELECT base.doc_id AS doc_id, n_bigrams,
        |        CAST(coalesce(top_cnt, 0) AS BIGINT) AS top_bigram_cnt,
        |        CASE WHEN n_bigrams > 0 THEN
        |          CAST(floor(CAST(coalesce(top_cnt, 0) AS DOUBLE)
        |               / n_bigrams * 10000) AS BIGINT)
        |        ELSE 0 END AS top_bigram_frac_e4,
        |        CASE WHEN n_tri > 0 THEN
        |          CAST(floor(CAST(n_tri - d_tri AS DOUBLE)
        |               / n_tri * 10000) AS BIGINT)
        |        ELSE 0 END AS dup_trigram_frac_e4
        |      FROM base LEFT JOIN top USING (doc_id))
        |SELECT doc_id, n_bigrams, top_bigram_cnt, top_bigram_frac_e4,
        |  dup_trigram_frac_e4,
        |  CAST(CASE WHEN top_bigram_frac_e4 > 1800
        |            OR dup_trigram_frac_e4 > 3000
        |       THEN 1 ELSE 0 END AS INTEGER) AS repetitive
        |FROM r""".stripMargin,
    "text_decontaminate_semantic" -> decontaminateSemanticOracle,
    "q_novel_content" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS wl
        |           FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(wl) - 1),
        |           i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])) AS g
        |       FROM w WHERE len(wl) >= 3),
        |ref AS (SELECT DISTINCT g FROM sh WHERE doc_id % 2 = 0),
        |cur AS (SELECT DISTINCT g FROM sh WHERE doc_id % 2 = 1),
        |nov AS (SELECT count(*) AS n_novel FROM cur
        |        ANTI JOIN ref USING (g)),
        |t AS (SELECT (SELECT count(*) FROM cur) AS n_cur_grams,
        |        n_novel FROM nov)
        |SELECT CAST(n_cur_grams AS BIGINT) AS n_cur_grams,
        |  CAST(n_novel AS BIGINT) AS n_novel,
        |  CAST(CASE WHEN n_cur_grams > 0
        |    THEN (n_novel * 10000) // n_cur_grams END AS BIGINT) AS novel_e4
        |FROM t""".stripMargin,
    "text_novelty" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS wl
        |           FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(wl) - 1),
        |           i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])) AS g
        |       FROM w WHERE len(wl) >= 3),
        |d AS (SELECT g, count(*) AS df FROM sh GROUP BY 1)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique,
        |  CAST((sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 10000)
        |    // count(*) AS BIGINT) AS novelty_e4
        |FROM sh JOIN d USING (g) GROUP BY doc_id""".stripMargin,
    "text_decontaminate" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS wl
        |           FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(wl) >= 3 THEN
        |           list_transform(range(1, len(wl) - 1),
        |             i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])
        |         ELSE CAST([] AS VARCHAR[]) END AS s
        |       FROM w),
        |ex AS (SELECT doc_id, unnest(list_distinct(s)) AS g FROM sh),
        |ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % 97 = 0),
        |hits AS (SELECT ex.doc_id, count(*) AS n_shared
        |         FROM ex JOIN ev USING (g)
        |         WHERE ex.doc_id % 97 <> 0 GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
        |  CAST(CASE WHEN coalesce(h.n_shared, 0) > 0 THEN 1 ELSE 0 END
        |       AS INTEGER) AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 97 <> 0""".stripMargin,
    // vocab-coverage replay: bigram-unit frequency -> global
    // (cnt desc, term asc) rank -> one cumulative leg per candidate
    // size, UNION ALL'd; all-integer so the curve hashes exactly
    "q_vocab_coverage" -> {
      val legs = VOCAB_SIZES.map { v =>
        s"""SELECT CAST($v AS INTEGER) AS vocab_size,
           |  CAST(count(*) AS BIGINT) AS n_terms,
           |  CAST(sum(cnt) AS BIGINT) AS covered_tok,
           |  tot.total_tok, tot.n_types,
           |  CAST(sum(cnt) * 10000 // tot.total_tok AS BIGINT)
           |    AS coverage_e4
           |FROM rkd, tot WHERE rk <= $v
           |GROUP BY tot.total_tok, tot.n_types""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH w AS (SELECT regexp_split_to_array(trim(lower(text)),
         |             '\\s+') AS wl
         |           FROM documents),
         |t AS (SELECT unnest(CASE WHEN len(wl) >= 2 THEN
         |          list_transform(range(1, len(wl)),
         |            i -> wl[i] || ' ' || wl[i+1])
         |        ELSE CAST([] AS VARCHAR[]) END) AS term
         |      FROM w),
         |f AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
         |      FROM t GROUP BY 1),
         |rkd AS (SELECT cnt,
         |          row_number() OVER (ORDER BY cnt DESC, term ASC) AS rk
         |        FROM f),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tok,
         |               CAST(count(*) AS BIGINT) AS n_types FROM f)
         |$legs""".stripMargin
    },
    // contamination-matrix replay: the same 3-gram machinery as
    // text_decontaminate, labeled eval slices unioned into one
    // (set, gram) frame, hit triples distinct on (source, set, doc),
    // dense matrix via the groups x sets cross join
    "q_contamination_matrix" ->
      """WITH w AS (SELECT doc_id, source,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS wl
        |           FROM documents),
        |sh AS (SELECT doc_id, source,
        |         CASE WHEN len(wl) >= 3 THEN
        |           list_transform(range(1, len(wl) - 1),
        |             i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])
        |         ELSE CAST([] AS VARCHAR[]) END AS s
        |       FROM w),
        |ex AS (SELECT doc_id, source, unnest(list_distinct(s)) AS g FROM sh),
        |ev AS (SELECT DISTINCT 'eval_a' AS eval_set, g FROM ex
        |       WHERE doc_id % 13 = 0
        |       UNION
        |       SELECT DISTINCT 'eval_b', g FROM ex WHERE doc_id % 17 = 0),
        |hits AS (SELECT DISTINCT ex.source, ev.eval_set, ex.doc_id
        |         FROM ex JOIN ev USING (g)
        |         WHERE ex.doc_id % 13 <> 0 AND ex.doc_id % 17 <> 0),
        |c AS (SELECT source, eval_set, CAST(count(*) AS BIGINT) AS n_contam
        |      FROM hits GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM w
        |        WHERE doc_id % 13 <> 0 AND doc_id % 17 <> 0 GROUP BY 1),
        |sets AS (SELECT DISTINCT eval_set FROM (
        |  SELECT 'eval_a' AS eval_set FROM w WHERE doc_id % 13 = 0
        |  UNION ALL
        |  SELECT 'eval_b' FROM w WHERE doc_id % 17 = 0))
        |SELECT tot.source, sets.eval_set, tot.n_docs,
        |  CAST(coalesce(c.n_contam, 0) AS BIGINT) AS n_contam,
        |  CAST(coalesce(c.n_contam, 0) * 10000 // tot.n_docs AS BIGINT)
        |    AS contam_rate_e4
        |FROM tot CROSS JOIN sets
        |LEFT JOIN c ON c.source = tot.source AND c.eval_set = sets.eval_set
        |""".stripMargin,
    // blocklist replay: same tokenization, list_filter hit count,
    // integer hit budget
    "q_blocklist" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS wl
        |           FROM documents),
        |h AS (SELECT doc_id, CAST(len(wl) AS BIGINT) AS n_words,
        |        CAST(len(list_filter(wl,
        |          x -> list_contains(['slow','bug','crash'], x)))
        |          AS BIGINT) AS n_blocked
        |      FROM w)
        |SELECT doc_id, n_words, n_blocked,
        |  CAST(CASE WHEN n_blocked <= 2 THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM h""".stripMargin,
    // scrub replay: 8-gram positions (1-based i covers words
    // [i, i+8)), contaminated starts = positions whose gram is in
    // the eval set, kept indices = words no start covers, rebuilt
    // text = space-join of survivors — the same filter identity the
    // Spark array lambda folds (0-based there; p<=j<p+8 shifts)
    "text_decontaminate_scrub" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS wl
        |           FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(wl) >= 8 THEN
        |           list_transform(range(1, len(wl) - 6),
        |             i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2] || ' '
        |               || wl[i+3] || ' ' || wl[i+4] || ' ' || wl[i+5] || ' '
        |               || wl[i+6] || ' ' || wl[i+7])
        |         ELSE CAST([] AS VARCHAR[]) END AS s
        |       FROM w),
        |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |tg AS (SELECT doc_id, unnest(s) AS g,
        |         unnest(range(1, len(s) + 1)) AS p
        |       FROM sh WHERE doc_id % 97 <> 0),
        |st AS (SELECT doc_id, list(DISTINCT p) AS ps
        |       FROM tg JOIN ev USING (g) GROUP BY 1),
        |c AS (SELECT w.doc_id, wl, coalesce(st.ps, CAST([] AS BIGINT[])) AS ps
        |      FROM w LEFT JOIN st USING (doc_id) WHERE w.doc_id % 97 <> 0),
        |k AS (SELECT doc_id, wl,
        |        list_filter(range(1, len(wl) + 1), j ->
        |          len(list_filter(ps, p -> p <= j AND j < p + 8)) = 0) AS idx
        |      FROM c)
        |SELECT doc_id,
        |  -- coalesce: array_to_string of an EMPTY list is NULL in
        |  -- DuckDB, but concat_ws of an empty array is '' in Spark —
        |  -- a fully-scrubbed document must compare equal
        |  coalesce(array_to_string(list_transform(idx, j -> wl[j]), ' '), '')
        |    AS clean_text,
        |  CAST(len(wl) AS BIGINT) AS n_words,
        |  CAST(len(idx) AS BIGINT) AS n_kept
        |FROM k""".stripMargin,
    "text_chunk" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS wl
        |           FROM documents),
        |s AS (SELECT doc_id, wl,
        |        range(0, greatest(CAST(ceil((len(wl) - 50) / 25.0) AS INTEGER), 0)
        |                 * 25 + 1,
        |              25) AS starts
        |      FROM w),
        |c AS (SELECT doc_id, wl, unnest(starts) AS st,
        |        unnest(range(0, len(starts))) AS chunk_id
        |      FROM s),
        |o AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |        wl[(st + 1):(st + 50)] AS ck
        |      FROM c)
        |SELECT doc_id, chunk_id, CAST(len(ck) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(ck, ' ')) AS chunk_hash
        |FROM o WHERE len(ck) > 0""".stripMargin,
    "q_bpe_step" ->
      """WITH w AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS wd
        |           FROM documents),
        |p AS (SELECT unnest(list_transform(range(1, length(wd)),
        |        i -> wd[i:i+1])) AS pair
        |      FROM w WHERE length(wd) >= 2),
        |c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY 1)
        |SELECT pair, cnt FROM c
        |ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin,
    "text_clean" ->
      """WITH s AS (SELECT doc_id,
        |    substr(text, 1, 60) || '.' || chr(10) ||
        |    'short line' || chr(10) ||
        |    'We use cookies and javascript on this site.' || chr(10) ||
        |    substr(text, 30, 50) || '!' || chr(10) ||
        |    'function() { return 0; }' AS synth
        |  FROM documents),
        |l AS (SELECT doc_id,
        |        list_transform(string_split(synth, chr(10)), x -> trim(x)) AS lines
        |      FROM s),
        |k AS (SELECT doc_id, lines,
        |        list_filter(lines, t ->
        |          length(t) > 0
        |          AND len(regexp_split_to_array(t, '\s+')) >= 3
        |          AND regexp_matches(t, '[.!?"”'']$')
        |          AND NOT contains(t, '{')
        |          AND NOT contains(lower(t), 'lorem ipsum')
        |          AND NOT contains(lower(t), 'javascript')
        |          AND NOT contains(lower(t), 'cookies')) AS kept
        |      FROM l)
        |SELECT doc_id,
        |  CASE WHEN len(kept) > 0 THEN array_to_string(kept, chr(10)) END AS clean_text,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  CAST(coalesce(list_sum(list_transform(kept, t -> length(t))), 0) AS BIGINT)
        |    AS kept_chars
        |FROM k""".stripMargin,
    "q_gopher_rules" -> {
      val sw = sqlStopwords("en")
      s"""WITH w AS (
        |  SELECT doc_id, text,
        |    regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
        |      AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
        |      AS BIGINT) AS n_alpha,
        |    CAST(len(list_intersect(list_distinct(ws), $sw)) AS BIGINT)
        |      AS stop_hits,
        |    CAST(len(list_filter(ws, x -> contains(x, '#')
        |      OR contains(x, '...') OR contains(x, '…'))) AS BIGINT) AS n_sym
        |  FROM w),
        |r AS (
        |  SELECT doc_id, n_words,
        |    (sum_len * 10000) // greatest(n_words, 1) AS mean_word_len_e4,
        |    (n_alpha * 10000) // greatest(n_words, 1) AS alpha_ratio_e4,
        |    stop_hits,
        |    (n_sym * 10000) // greatest(n_words, 1) AS symbol_ratio_e4
        |  FROM m)
        |SELECT doc_id, n_words, mean_word_len_e4, alpha_ratio_e4,
        |  stop_hits, symbol_ratio_e4,
        |  CAST(CASE WHEN n_words BETWEEN 20 AND 100000
        |    AND mean_word_len_e4 BETWEEN 30000 AND 100000
        |    AND alpha_ratio_e4 >= 8000 AND stop_hits >= 2
        |    AND symbol_ratio_e4 <= 1000 THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM r""".stripMargin
    },
    // q_heavy_hitters replay: the guarantee argument (MG candidates ⊇
    // terms with cnt·k > n) means the oracle is just the exact filter
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(
        |             regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |           FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
        |      FROM t GROUP BY term)
        |SELECT term, cnt FROM c, n WHERE cnt * 64 > n""".stripMargin,

    // q_bm25 replay: same expression tree, same association — `(1.2 +
    // 1.0)` is an IEEE add in both engines, per-term floor-e6 before
    // the (exact integer) per-document sum
    "q_bm25" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |           FROM documents),
        |d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM w),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(dl) AS BIGINT) AS sumdl FROM d),
        |t AS (SELECT doc_id, dl, unnest(ws) AS term FROM d),
        |m AS (SELECT * FROM t WHERE term IN ('spark', 'query', 'join')),
        |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM m GROUP BY doc_id, dl, term),
        |dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |        FROM m GROUP BY term),
        |sc AS (SELECT doc_id,
        |         CAST(floor((ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) *
        |           ((tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 *
        |             (CAST(dl * n AS DOUBLE) / CAST(sumdl AS DOUBLE))))))
        |           * 1000000.0) AS BIGINT) AS s_e6
        |       FROM tf JOIN dft USING (term) CROSS JOIN st)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(s_e6) AS BIGINT) AS score_e6
        |FROM sc GROUP BY doc_id
        |ORDER BY score_e6 DESC, doc_id ASC LIMIT 20""".stripMargin,
    // q_bm25_rm3 replay: the seed pass LIMIT 5, the occurrence-count
    // expansion pick (non-seed terms, count desc / term asc, LIMIT
    // 3), and the second pass over seeds UNION expansion — identical
    // micro-unit arithmetic in both passes
    "q_bm25_rm3" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |           FROM documents),
        |d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM w),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(dl) AS BIGINT) AS sumdl FROM d),
        |t AS (SELECT doc_id, dl, unnest(ws) AS term FROM d),
        |m1 AS (SELECT * FROM t WHERE term IN ('spark', 'query', 'join')),
        |tf1 AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        |        FROM m1 GROUP BY doc_id, dl, term),
        |dft1 AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |         FROM m1 GROUP BY term),
        |sc1 AS (SELECT doc_id,
        |          CAST(floor((ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) *
        |            ((tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 *
        |              (CAST(dl * n AS DOUBLE) / CAST(sumdl AS DOUBLE))))))
        |            * 1000000.0) AS BIGINT) AS s_e6
        |        FROM tf1 JOIN dft1 USING (term) CROSS JOIN st),
        |fbd AS (SELECT doc_id FROM (
        |          SELECT doc_id, CAST(sum(s_e6) AS BIGINT) AS score_e6
        |          FROM sc1 GROUP BY doc_id
        |          ORDER BY score_e6 DESC, doc_id ASC LIMIT 5)),
        |ft AS (SELECT term FROM t JOIN fbd USING (doc_id)
        |       WHERE term NOT IN ('spark', 'query', 'join')
        |       GROUP BY term
        |       ORDER BY count(*) DESC, term ASC LIMIT 3),
        |qt AS (SELECT 'spark' AS term UNION ALL SELECT 'query'
        |       UNION ALL SELECT 'join' UNION ALL SELECT term FROM ft),
        |m2 AS (SELECT * FROM t WHERE term IN (SELECT term FROM qt)),
        |tf2 AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        |        FROM m2 GROUP BY doc_id, dl, term),
        |dft2 AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |         FROM m2 GROUP BY term),
        |sc2 AS (SELECT doc_id,
        |          CAST(floor((ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) *
        |            ((tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 *
        |              (CAST(dl * n AS DOUBLE) / CAST(sumdl AS DOUBLE))))))
        |            * 1000000.0) AS BIGINT) AS s_e6
        |        FROM tf2 JOIN dft2 USING (term) CROSS JOIN st)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(s_e6) AS BIGINT) AS score_e6
        |FROM sc2 GROUP BY doc_id
        |ORDER BY score_e6 DESC, doc_id ASC LIMIT 20""".stripMargin,
    // q_bm25_batch replay: same per-term micro-unit scores, fan-out
    // via the VALUES query table, rank window per qid (integer
    // scores, doc_id tiebreak — TopK.perKey's exact ordering)
    "q_bm25_batch" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |           FROM documents),
        |d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM w),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(dl) AS BIGINT) AS sumdl FROM d),
        |t AS (SELECT doc_id, dl, unnest(ws) AS term FROM d),
        |qq AS (SELECT * FROM (VALUES (0, 'spark'), (0, 'query'),
        |         (0, 'join'), (1, 'fast'), (1, 'table'), (2, 'data'))
        |       AS v(qid, term)),
        |m AS (SELECT * FROM t WHERE term IN (SELECT term FROM qq)),
        |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM m GROUP BY doc_id, dl, term),
        |dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |        FROM m GROUP BY term),
        |sc AS (SELECT doc_id, tf.term,
        |         CAST(floor((ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) *
        |           ((tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 *
        |             (CAST(dl * n AS DOUBLE) / CAST(sumdl AS DOUBLE))))))
        |           * 1000000.0) AS BIGINT) AS s_e6
        |       FROM tf JOIN dft USING (term) CROSS JOIN st),
        |qs AS (SELECT qq.qid, sc.doc_id,
        |         CAST(sum(s_e6) AS BIGINT) AS score_e6
        |       FROM sc JOIN qq ON qq.term = sc.term
        |       GROUP BY qq.qid, sc.doc_id),
        |r AS (SELECT qid, doc_id, score_e6,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY score_e6 DESC, doc_id ASC) AS rn
        |      FROM qs)
        |SELECT CAST(qid AS BIGINT) AS qid, doc_id, score_e6,
        |  CAST(rn AS BIGINT) AS rank
        |FROM r WHERE rn <= 5""".stripMargin,
    // q_perplexity replay: bigram/unigram counts from the reference
    // split, zipped-unnest (prev, cur) pairs, the same CASE ladder
    // with one fixed association, per-token floor to micro-nats
    "q_perplexity" -> perplexityOracle,
    "q_min_k_prob" -> minKProbOracle,
    "q_perplexity3" -> perplexity3Oracle,
    "q_perplexity3_bcast" -> perplexity3Oracle,
    "q_perplexity4_bcast" -> perplexity4Oracle,
    "q_perplexity5_bcast" -> perplexity5Oracle,
    // q_rrf replay: the q_bm25 lexical top-20 (identical CTE chain)
    // and the knn_cosine top-20 for query vector 0 (same round-6
    // rank key TopK uses), fused with integer-division contributions
    "q_rrf" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |           FROM documents),
        |d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM w),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(dl) AS BIGINT) AS sumdl FROM d),
        |t AS (SELECT doc_id, dl, unnest(ws) AS term FROM d),
        |m AS (SELECT * FROM t WHERE term IN ('spark', 'query', 'join')),
        |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM m GROUP BY doc_id, dl, term),
        |dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |        FROM m GROUP BY term),
        |sc AS (SELECT doc_id,
        |         CAST(floor((ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) *
        |           ((tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 *
        |             (CAST(dl * n AS DOUBLE) / CAST(sumdl AS DOUBLE))))))
        |           * 1000000.0) AS BIGINT) AS s_e6
        |       FROM tf JOIN dft USING (term) CROSS JOIN st),
        |lexs AS (SELECT doc_id, CAST(sum(s_e6) AS BIGINT) AS score_e6
        |         FROM sc GROUP BY doc_id
        |         ORDER BY score_e6 DESC, doc_id ASC LIMIT 20),
        |lex AS (SELECT doc_id,
        |          row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC)
        |            AS rank
        |        FROM lexs),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |       WHERE vec_id = 0),
        |cv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |       FROM embeddings),
        |vs AS (SELECT cv.vec_id AS doc_id,
        |         list_cosine_similarity(qv.e, cv.e) AS sim
        |       FROM qv CROSS JOIN cv WHERE cv.vec_id <> 0),
        |vr AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY round(sim, 6) DESC,
        |                            doc_id ASC) AS rank
        |       FROM vs),
        |u AS (SELECT doc_id, rank FROM lex
        |      UNION ALL
        |      SELECT doc_id, rank FROM vr WHERE rank <= 20)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
        |  CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_e6
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_e6 DESC, doc_id ASC LIMIT 10""".stripMargin,
    // q_rrf_batch replay: the q_bm25_batch per-query lexical top-10
    // and the per-query cosine top-10 (vec_id 0/1/2), fused with
    // integer-division contributions, top-5 per query
    "q_rrf_batch" ->
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |           FROM documents),
        |d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM w),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(dl) AS BIGINT) AS sumdl FROM d),
        |t AS (SELECT doc_id, dl, unnest(ws) AS term FROM d),
        |qq AS (SELECT * FROM (VALUES (0, 'spark'), (0, 'query'),
        |         (0, 'join'), (1, 'fast'), (1, 'table'), (2, 'data'))
        |       AS v(qid, term)),
        |m AS (SELECT * FROM t WHERE term IN (SELECT term FROM qq)),
        |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM m GROUP BY doc_id, dl, term),
        |dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |        FROM m GROUP BY term),
        |sc AS (SELECT doc_id, tf.term,
        |         CAST(floor((ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) *
        |           ((tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 *
        |             (CAST(dl * n AS DOUBLE) / CAST(sumdl AS DOUBLE))))))
        |           * 1000000.0) AS BIGINT) AS s_e6
        |       FROM tf JOIN dft USING (term) CROSS JOIN st),
        |qs AS (SELECT qq.qid, sc.doc_id,
        |         CAST(sum(s_e6) AS BIGINT) AS score_e6
        |       FROM sc JOIN qq ON qq.term = sc.term
        |       GROUP BY qq.qid, sc.doc_id),
        |lex AS (SELECT qid, doc_id, rn AS rank FROM (
        |          SELECT qid, doc_id,
        |            row_number() OVER (PARTITION BY qid
        |              ORDER BY score_e6 DESC, doc_id ASC) AS rn
        |          FROM qs) WHERE rn <= 10),
        |qv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |       FROM embeddings WHERE vec_id < 3),
        |cv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |       FROM embeddings),
        |vs AS (SELECT qv.vec_id AS qid, cv.vec_id AS doc_id,
        |         list_cosine_similarity(qv.e, cv.e) AS sim
        |       FROM qv JOIN cv ON qv.vec_id <> cv.vec_id),
        |vr AS (SELECT qid, doc_id, rn AS rank FROM (
        |         SELECT qid, doc_id,
        |           row_number() OVER (PARTITION BY qid
        |             ORDER BY round(sim, 6) DESC, doc_id ASC) AS rn
        |         FROM vs) WHERE rn <= 10),
        |u AS (SELECT * FROM lex UNION ALL SELECT * FROM vr),
        |f AS (SELECT qid, doc_id,
        |        CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_e6
        |      FROM u GROUP BY qid, doc_id),
        |r AS (SELECT qid, doc_id, rrf_e6,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY rrf_e6 DESC, doc_id ASC) AS rn
        |      FROM f)
        |SELECT CAST(qid AS BIGINT) AS qid, doc_id, rrf_e6,
        |  CAST(rn AS BIGINT) AS rank
        |FROM r WHERE rn <= 5""".stripMargin,
    "q_inverted_index" ->
      """WITH t0 AS (SELECT doc_id,
        |              unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |            FROM documents),
        |t AS (SELECT DISTINCT doc_id, term FROM t0)
        |SELECT term, count(*) AS df,
        |  md5(array_to_string(list_sort(list(doc_id)), ',')) AS postings_hash
        |FROM t GROUP BY term""".stripMargin
  ) ++ Map(
    // the broadcast-model form computes byte-identical results to the
    // join form, so it replays with the same SQL
    "q_perplexity_bcast" -> perplexityOracle,
    "q_curriculum_order" -> curriculumOracle,
    "q_domain_reweight" -> domainReweightOracle,
    "q_k_anonymity" -> kAnonymityOracle,
    "q_l_diversity" -> lDiversityOracle,
    "q_t_closeness" -> tClosenessOracle,
    "q_excess_loss" -> excessLossOracle,
    "q_readability" -> readabilityOracle,
    "q_ccnet_buckets" -> ccnetBucketsOracle,
    "text_extract_html" -> extractHtmlOracle,
    "text_boilerplate" -> boilerplateOracle,
    "text_outlinks" -> outlinksOracle)

  /** Shared CTE replay of HtmlExtract's block classifier: same synth
    * page, same RE2-safe regexes, same replace-chain entity decode
    * (&amp; last), same first-failing integer rules. Produces
    * k(doc_id, cs = list of {txt, reason}). */
  private[queries] lazy val htmlBlocksCte: String =
    """WITH h AS (SELECT doc_id,
      |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title><style>.m{color:#333}</style><script type="text/javascript">var t = 1 && document.cookie;</script></head><body>' ||
      |    '<nav><a href="/">Home</a> <a href="/archive">Archive</a> <a href="/tags">Tags</a></nav><h1>' ||
      |    substr(text, 1, 20) || '</h1><p>' || substr(text, 1, 120) ||
      |    '.</p><p>' || substr(text, 121, 160) ||
      |    ' &amp; more.</p><p><img src="/one.png"><img src="/two.png"><img src="/three.png"> img alt fig</p>' ||
      |    '<ul><li><a href="/more">Read more posts</a></li><li><a href="/share">Share this page</a></li></ul>' ||
      |    '<footer>Copyright 2026 <a href="/privacy">Privacy</a> <a href="/imprint">Imprint</a> <a href="/doc/' ||
      |    CAST(doc_id % 50 AS VARCHAR) || '">see doc ' ||
      |    CAST(doc_id % 50 AS VARCHAR) || '</a></footer></body></html>'
      |      AS html
      |  FROM documents),
      |c AS (SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(html,
      |      '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
      |      '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g') AS ch
      |  FROM h),
      |b AS (SELECT doc_id, list_filter(
      |    string_split(regexp_replace(ch,
      |      '(?i)</?(p|div|h[1-6]|li|ul|ol|nav|footer|header|article|section|table|tr|th|td|blockquote|pre|br|hr)(\s[^>]*)?/?>',
      |      chr(10), 'g'), chr(10)),
      |    r -> trim(r) <> '') AS raws
      |  FROM c),
      |m AS (SELECT doc_id, list_transform(raws, r -> struct_pack(
      |    txt := trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(
      |        regexp_replace(r, '<[^>]*>', ' ', 'g'),
      |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
      |      '\s+', ' ', 'g')),
      |    link_chars := coalesce(list_sum(list_transform(
      |      regexp_extract_all(r, '(?i)<a[^>]*>([^<]*)</a>', 1),
      |      x -> length(x))), 0),
      |    n_tags := len(regexp_extract_all(r, '<[^>]*>', 0)))) AS ms
      |  FROM b),
      |k AS (SELECT doc_id, list_transform(ms, m -> struct_pack(
      |    txt := m['txt'],
      |    reason := CASE
      |      WHEN (CASE WHEN m['txt'] = '' THEN 0
      |            ELSE len(string_split(m['txt'], ' ')) END) < 3
      |        THEN 'empty_or_short'
      |      WHEN floor(m['link_chars'] * 10000 / length(m['txt'])) > 2000
      |        THEN 'link_heavy'
      |      WHEN floor(m['n_tags'] * 10000 /
      |          len(string_split(m['txt'], ' '))) > 5000
      |        THEN 'tag_soup'
      |      WHEN len(string_split(m['txt'], ' ')) < 10 AND
      |          floor(len(list_filter(string_split(lower(m['txt']), ' '),
      |            w -> w IN ('the','a','of','and','to','in','is','it')))
      |            * 10000 / len(string_split(m['txt'], ' '))) < 300
      |        THEN 'short_no_stop'
      |      ELSE 'kept' END)) AS cs
      |  FROM m)""".stripMargin

  private lazy val extractHtmlOracle: String =
    htmlBlocksCte +
      """,
        |e AS (SELECT doc_id, cs,
        |    list_transform(list_filter(cs, c -> c['reason'] = 'kept'),
        |      c -> c['txt']) AS kept
        |  FROM k)
        |SELECT doc_id,
        |  CAST(len(cs) AS BIGINT) AS n_blocks,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  CASE WHEN len(kept) = 0 THEN NULL
        |       ELSE array_to_string(kept, chr(10)) END AS main_text,
        |  CAST(coalesce(length(CASE WHEN len(kept) = 0 THEN NULL
        |       ELSE array_to_string(kept, chr(10)) END), 0) AS BIGINT)
        |    AS main_chars
        |FROM e""".stripMargin

  private lazy val boilerplateOracle: String =
    htmlBlocksCte +
      """,
        |e AS (SELECT unnest(cs) AS c FROM k),
        |g AS (SELECT c['reason'] AS reason, count(*) AS n_blocks
        |      FROM e GROUP BY 1),
        |t AS (SELECT CAST(sum(n_blocks) AS BIGINT) AS total_blocks FROM g)
        |SELECT reason, n_blocks, total_blocks,
        |  CAST(floor(n_blocks * 10000 / total_blocks) AS BIGINT) AS share_e4
        |FROM g CROSS JOIN t""".stripMargin

  /** text_outlinks replay: same preCleaned page (htmlBlocksCte's h/c;
    * the unused block CTEs prune away), two positionally-aligned
    * regexp_extract_all passes zipped by a range subscript. */
  private lazy val outlinksOracle: String =
    htmlBlocksCte +
      """,
        |l AS (SELECT doc_id,
        |    regexp_extract_all(ch,
        |      '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 1) AS hrefs,
        |    regexp_extract_all(ch,
        |      '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 2) AS anchors
        |  FROM c),
        |u AS (SELECT doc_id,
        |    unnest(range(1, len(hrefs) + 1)) AS r, hrefs, anchors
        |  FROM l)
        |SELECT doc_id, CAST(r AS BIGINT) AS rank, hrefs[r] AS href,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(anchors[r], '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS anchor,
        |  regexp_extract(hrefs[r], '^/([A-Za-z0-9_-]+)', 1) AS section
        |FROM u""".stripMargin
}
