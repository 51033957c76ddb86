package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source (per-domain) reputation — the curation step between
  * document-level quality scoring ([[Quality]]) and a static
  * blocklist ([[Quality.blocklistAnnotate]]): aggregate document
  * signals BY SOURCE, score each source, and gate documents on their
  * source's reputation. The C4/RefinedWeb pipelines apply exactly
  * this shape per domain (a domain that is 80% boilerplate dupes or
  * langid-inconsistent is dropped wholesale, not per-document).
  *
  * Scale shape: the only corpus-scale exchanges are (1) one window
  * count over md5(text) for corpus-wide duplicate flags and (2) the
  * map-combined groupBy(source) — both linear, no self-join. The
  * distinct-source table is tiny by construction (domains ≪ docs),
  * so the per-source score and the document gate join back
  * broadcast.
  *
  * All ratios are floor-scaled e4 INTEGERS computed from integer
  * operands (sum of per-doc floored ratios, then integer mean) so a
  * SQL replay hash-matches exactly.
  */
object Reputation {

  /** Per-source reputation table.
    * @param stopwordVocab language-anchor vocabulary for the quality
    *                      leg (distinct-word hits, like text_quality)
    * @return one row per source: n_docs, n_dup_docs (corpus-wide
    *         exact-text duplicates), dup_e4, mean_stop_e4 (mean of
    *         per-doc floored stopword-hit ratios), top_lang +
    *         lang_share_e4 (dominant declared language and its
    *         share), rep_e4 = ((10000 - dup_e4)*5 + mean_stop_e4*3 +
    *         lang_share_e4*2) div 10 — integer weights, exactly
    *         replayable. */
  def sourceStats(docs: DataFrame, textCol: String,
                  sourceCol: String, langCol: String,
                  stopwordVocab: Seq[String]): DataFrame = {
    val nWords = graft.functions.TextFunctions.tokenCount(col(textCol))
      .cast("double")
    val hits = graft.functions.TextFunctions
      .vocabHits(col(textCol), stopwordVocab).cast("double")
    val base = docs.select(
      col(sourceCol).as("source"),
      col(langCol).as("lang"),
      md5(col(textCol)).as("__h"),
      floor(hits / nWords * 10000).cast("long").as("__stop_e4"))
    // corpus-wide duplicate flag: ONE exchange on the text hash.
    // The lang branch below reads `base`, not this frame, so its plan
    // carries no window at all.
    val perDoc = base.withColumn("__dup",
      (count(lit(1)).over(Window.partitionBy(col("__h"))) > 1)
        .cast("long"))
    val bySource = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__dup")).as("n_dup_docs"),
        sum(col("__stop_e4")).as("__stop_sum"))
    // dominant declared language per source: (source, lang) counts,
    // deterministic argmax (count desc, lang asc)
    val langRank = Window.partitionBy(col("source"))
      .orderBy(col("__n").desc, col("lang").asc)
    val topLang = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rn", row_number().over(langRank))
      .filter(col("__rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("__n").as("__top_n"))
    bySource.join(topLang, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        expr("n_dup_docs * 10000 div n_docs").as("dup_e4"),
        expr("__stop_sum div n_docs").as("mean_stop_e4"),
        col("top_lang"),
        expr("__top_n * 10000 div n_docs").as("lang_share_e4"))
      .withColumn("rep_e4",
        expr("((10000 - dup_e4) * 5 + mean_stop_e4 * 3 + lang_share_e4 * 2) div 10"))
  }

  /** Gate documents on their source's reputation: keep rows whose
    * source scores `rep_e4 >= minRep`. The reputation table is tiny
    * (one row per source), so the gate is a broadcast semi-join —
    * document text never re-shuffles. */
  def sourceFilter(docs: DataFrame, textCol: String,
                   sourceCol: String, langCol: String,
                   stopwordVocab: Seq[String], minRep: Long): DataFrame = {
    val keep = sourceStats(docs, textCol, sourceCol, langCol,
        stopwordVocab)
      .filter(col("rep_e4") >= minRep)
      .select(col("source").as(sourceCol))
    docs.join(broadcast(keep), Seq(sourceCol), "left_semi")
  }
}
