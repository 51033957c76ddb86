package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, shingling, quality metrics, language
  * heuristics, fingerprints, simhash. Everything is built from
  * codegen'd `org.apache.spark.sql.functions` (no UDFs), so the
  * expressions inline into whole-stage codegen and run at scan speed;
  * all hashing is MD5-hex based so results are engine-portable and
  * deterministic (no seed state).
  */
object TextFunctions {

  /** Lowercased whitespace tokens — the codegen'd
    * [[graft.plans.WordsOf]] kernel (optimization round 17): the
    * exact value contract of `split(trim(lower(text)), "\\s+")`
    * (differentially pinned in TextKernelsSpec) without the
    * java.util.regex engine on the scan side of every text query. */
  def words(text: Column): Column =
    org.apache.spark.sql.graftglue.Bridge.column(
      graft.plans.WordsOf(
        org.apache.spark.sql.graftglue.Bridge.expression(text)))

  /** Whitespace token count (original casing irrelevant) — the
    * codegen'd [[graft.plans.WordCountOf]] kernel: the exact value of
    * `size(split(trim(text), "\\s+"))` with no token-array
    * allocation. */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.graftglue.Bridge.column(
      graft.plans.WordCountOf(
        org.apache.spark.sql.graftglue.Bridge.expression(text)))

  /** [[tokenCount]] as the drop-in for `size(words(text))` call
    * sites (identical count — lowercasing cannot create or destroy
    * whitespace; see [[graft.plans.WordsOf.count]]): the per-doc
    * length gauges (privacy-profile length buckets, length
    * histograms) need the count, never the tokens — this form skips
    * the token-array allocation entirely. */
  def wordCount(text: Column): Column = tokenCount(text)

  /** BPE-ish token count: alpha runs, digit runs, single punctuation. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Shingles from an already-materialized word-array column — the
    * codegen'd [[graft.plans.ShinglesOfWords]] kernel (optimization
    * round 16; the previous `transform(sequence(...), i ->
    * concat_ws(...))` HOF was interpreted per element and sat on the
    * scan side of every shingle pipeline). Same values and null
    * contract as the HOF form: null or short inputs yield an empty
    * array, a null WORD is skipped by the join (concat_ws). */
  def shinglesOfWords(w: Column, n: Int = 3): Column =
    coalesce(
      org.apache.spark.sql.graftglue.Bridge.column(
        graft.plans.ShinglesOfWords(
          org.apache.spark.sql.graftglue.Bridge.expression(w), n)),
      array().cast("array<string>"))

  /** Word n-gram shingles (w_i .. w_{i+n-1} joined by spaces); empty
    * array when the text has fewer than n words. Convenience form —
    * prefer projecting [[words]] first and using [[shinglesOfWords]]
    * in hot paths (see its scaladoc).
    */
  def shingles(text: Column, n: Int = 3): Column = shinglesOfWords(words(text), n)

  /** Unicode NFC normalization — canonical composition so visually
    * identical strings (combining sequences vs precomposed chars)
    * compare, hash, and dedup as equal; the standard first step of a
    * text-cleaning pipeline. JDK Normalizer implements the same
    * Unicode algorithm as DuckDB's nfc_normalize, so results are
    * engine-exact. (UDF: Spark has no built-in normalizer.) */
  val normalizeNfc: Column => Column = {
    val u = org.apache.spark.sql.functions.udf { (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }
    c => u(c)
  }

  /** Document fingerprint: MD5 of the sorted distinct word set —
    * invariant under word order and repetition, the cheap
    * bag-of-words dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))

  /** One codegen'd [[graft.plans.CharProfile]] per text — Catalyst
    * subexpression elimination shares it when a projection reads
    * both fields (the old per-field ScalaUDFs each ran their own
    * hash-counting pass AND blocked whole-stage codegen). */
  private def charProfile(text: Column): Column =
    org.apache.spark.sql.graftglue.Bridge.column(
      graft.plans.CharProfile(
        org.apache.spark.sql.graftglue.Bridge.expression(text)))

  /** Char-distribution Shannon entropy in e4 fixed-point NATS — the
    * classic gibberish/boilerplate signal (natural prose sits near
    * ~3 nats; base64 blobs, repeated-char padding and binary spill
    * sit far above/below). Computed as
    * `floor((ln(n)·n − Σ c·ln c) · 10000 / n)` over the per-char
    * counts so the single-distinct-char case is EXACTLY zero
    * (ln(n)·n − n·ln(n) cancels bit-exactly; the naive
    * ln(n) − Σ(c/n)·ln(c)... form rounds twice and can floor to −1).
    * One codegen'd hash-counting pass per row (the CharProfile
    * expression; the earlier distinct-chars × filter-count HOF form
    * cost O(n·distinct) INTERPRETED evaluations per document — 43 s
    * at sf0.1 once the bench stopped count()-pruning it, and its UDF
    * successor still paid per-row ser/de twice). The c·ln c terms
    * fold left-to-right over code-point-ascending distinct chars —
    * the same order as `array_sort` over 1-char strings (UTF-8 byte
    * order preserves code-point order), so results are bit-identical
    * to the old form and the SQL replay. Empty/null text scores 0. */
  def charEntropyE4(text: Column): Column =
    coalesce(charProfile(text).getField("entropy_e4"), lit(0L))

  /** Distinct-character count (0 for empty/null text). */
  def charDistinct(text: Column): Column =
    coalesce(charProfile(text).getField("n_uniq"), lit(0L))

  /** 48-bit hash per shingle (first 12 md5 hex digits as BIGINT —
    * portable: DuckDB `CAST('0x'||substring(md5(s),1,12) AS BIGINT)`).
    * MUST be materialized in its own projection before feeding
    * [[winnowedMins]]: HOF lambdas are interpreted with no common-
    * subexpression elimination, so an inline hash array would be
    * recomputed for every window — O(shingles^2) md5 calls per doc.
    */
  def shingleHashes48(shingleArr: Column): Column =
    shingleHashesHex(shingleArr, 12)

  /** [[shingleHashes48]] with a caller-chosen key width in md5 hex
    * digits (4 bits each) — narrowed widths let collision specs force
    * collisions cheaply; 12 digits = the production 48-bit key.
    * Codegen'd [[graft.plans.Hash48Array]] kernel (round 16) — same
    * values as the interpreted per-element
    * `conv(substring(md5(s),1,d),16,10)` transform it replaces. */
  def shingleHashesHex(shingleArr: Column, hexDigits: Int): Column =
    org.apache.spark.sql.graftglue.Bridge.column(
      graft.plans.Hash48Array(
        org.apache.spark.sql.graftglue.Bridge.expression(shingleArr),
        hexDigits))

  /** Winnowed fingerprint minima (the MOSS/winnowing algorithm,
    * Schleimer et al. 2003) over a *pre-projected* [[shingleHashes48]]
    * array: slide a window of `w` consecutive hashes, keep each
    * window's minimum. Near-identical documents share most minima;
    * position-robust unlike whole-doc hashes. The rolling window runs
    * as list-level expressions (`transform`/`slice`/`array_min`) —
    * partition-local, no explode, exact-replayable in SQL. Docs with
    * fewer than w windows contribute the min of what they have; docs
    * with no shingles yield an empty array.
    */
  def winnowedMins(hashArr: Column, w: Int = 4): Column =
    // codegen'd kernel (round 16) — same rolling minima and null
    // contract as the interpreted transform/slice/array_min HOF form
    // it replaces (O(size·w) interpreted calls per doc)
    org.apache.spark.sql.graftglue.Bridge.column(
      graft.plans.WinnowMins(
        org.apache.spark.sql.graftglue.Bridge.expression(hashArr), w))

  /** Per-seed MinHash value: lexicographic min of seeded MD5 over the
    * document's shingles. Null for docs with no shingles.
    */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(s"$seed|"), s))))

  /** +1/-1 vote of one word for SimHash bit j. Bit j of a word's
    * hash is bit (3 - j%4) of hex digit (j/4) of md5(word) — exact
    * integer arithmetic, reproducible in any engine with md5 (the
    * oracle uses strpos on the hex alphabet; same value).
    */
  def simhashVote(word: Column, j: Int): Column = {
    val pos = j / 4 + 1 // 1-indexed hex digit of the md5 string
    val shift = 3 - j % 4
    val digit = conv(substring(md5(word), pos, 1), 16, 10).cast("int")
    val bit = shiftright(digit, shift).bitwiseAND(lit(1))
    bit * 2 - 1
  }

  /** Combine 16 per-bit vote sums into the simhash value. */
  def simhashFromVotes(voteSums: Seq[Column]): Column =
    voteSums.zipWithIndex.map { case (s, j) =>
      when(s >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Stopword sets used by the language heuristic and quality score. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"))

  /** Count of distinct words present in a constant vocabulary. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(array_intersect(array_distinct(words(text)),
      array(vocab.map(lit): _*)))

  /** Language guess: argmax of stopword hits in fixed language order,
    * 'unknown' when nothing matches. A real system swaps in char
    * n-gram profiles; the contract (deterministic, engine-portable,
    * one pass) stays the same.
    */
  def langId(text: Column): Column = {
    val langs = Seq("en", "de", "es", "fr")
    val hits = langs.map(l => l -> vocabHits(text, stopwords(l))).toMap
    val allZero = hits.values.reduce(_ + _) === 0
    val best = langs.foldRight(lit("unknown")) { (l, acc) =>
      when(langs.filter(_ != l).map(o => hits(l) >= hits(o)).reduce(_ && _), lit(l))
        .otherwise(acc)
    }
    when(allZero, lit("unknown")).otherwise(best)
  }
}
