package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher document-level quality rules (Rae et al. 2021, Appendix A
  * — the rule set MassiveText and most later crawl pipelines apply
  * after line-level cleaning and before model-based filtering):
  * word-count bounds, mean-word-length bounds, alphabetic-word
  * ratio, minimum distinct stopwords, and a symbol-to-word cap.
  * (The paper's repetition rules — duplicate line / top-n-gram
  * fractions — are the `text_repetition` signals; compose both for
  * the full set.)
  *
  * Every statistic is an exact integer: ratios ship as `e4` fixed
  * point via INTEGER division `(x * 10000) div n_words`, so the
  * whole rule table replays bit-for-bit in any SQL engine with no
  * float in sight. All columns are narrow array expressions over the
  * tokenized text — zero shuffle, scan speed at 100 TB, same plan
  * shape as [[LineFilter]].
  */
object GopherRules {
  import graft.functions.TextFunctions.{words, stopwords}

  /** Per-document rule statistics + `keep`. Thresholds default to the
    * paper's (word count 50..100k, mean word length 3..10 chars,
    * >=80% words with an alphabetic character, >=2 distinct
    * stopwords, <=10% hash/ellipsis-bearing words). */
  def apply(df: DataFrame, idCol: String, textCol: String,
            minWords: Long = 50, maxWords: Long = 100000,
            minMeanLenE4: Long = 30000, maxMeanLenE4: Long = 100000,
            minAlphaE4: Long = 8000, minStopHits: Long = 2,
            maxSymbolE4: Long = 1000): DataFrame =
    ofWords(df.select(col(idCol), words(col(textCol)).as("__gw")),
      idCol, "__gw", minWords, maxWords, minMeanLenE4, maxMeanLenE4,
      minAlphaE4, minStopHits, maxSymbolE4)

  /** [[apply]] over an already-projected word-array column — composed
    * pipelines (the [[Curation]] builder) tokenize once. */
  def ofWords(df: DataFrame, idCol: String, wordsCol: String,
              minWords: Long = 50, maxWords: Long = 100000,
              minMeanLenE4: Long = 30000, maxMeanLenE4: Long = 100000,
              minAlphaE4: Long = 8000, minStopHits: Long = 2,
              maxSymbolE4: Long = 1000): DataFrame = {
    val w = col(wordsCol)
    // exact integer division (a - a%n)/n: the subtraction makes the
    // double division exact (quotient < 2^53), replaying as DuckDB
    // `//`; greatest(n,1) keeps zero out — the n_words bound rejects
    // empty docs independently
    def rate(numer: Column, n: Column): Column =
      IntMath.idivTrunc(numer * lit(10000L), greatest(n, lit(1L)))
    val nW = size(w).cast("long")
    val sumLen = coalesce(
      aggregate(w, lit(0L), (acc, x) => acc + length(x)), lit(0L))
    val nAlpha = size(filter(w, x => x.rlike("[a-z]"))).cast("long")
    val nSym = size(filter(w,
      x => x.contains("#") || x.contains("...") || x.contains("…")))
      .cast("long")
    df.select(
        col(idCol), nW.as("n_words"),
        rate(sumLen, nW).as("mean_word_len_e4"),
        rate(nAlpha, nW).as("alpha_ratio_e4"),
        size(array_intersect(array_distinct(w),
          array(stopwords("en").map(lit): _*))).cast("long")
          .as("stop_hits"),
        rate(nSym, nW).as("symbol_ratio_e4"))
      .withColumn("keep",
        (col("n_words").between(minWords, maxWords) &&
          col("mean_word_len_e4").between(minMeanLenE4, maxMeanLenE4) &&
          col("alpha_ratio_e4") >= minAlphaE4 &&
          col("stop_hits") >= minStopHits &&
          col("symbol_ratio_e4") <= maxSymbolE4).cast("int"))
  }
}
