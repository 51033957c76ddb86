package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level document cleaning (Raffel et al. 2020 §2.2):
  * the stage BETWEEN raw crawl text and document-level quality
  * filtering, where boilerplate is removed line by line before any
  * doc-level statistic is computed.
  *
  * A line survives when it
  *   - has at least `minWords` whitespace words,
  *   - ends in terminal punctuation (. ! ? or a closing quote),
  *   - is not brace-bearing code or a cookie/javascript banner.
  *
  * Everything is array expressions over `split(text, '\n')` — narrow,
  * zero shuffle, inlined into whole-stage codegen where possible; at
  * 100 TB this runs at scan speed alongside the parquet read, which
  * is the only plan shape that survives (a shuffle-bearing clean step
  * on raw crawl bytes would dominate the whole pipeline).
  *
  * Returned frame = input columns + `clean_text` (kept lines joined
  * by '\n', null when nothing survives) + `n_lines` / `n_kept` /
  * `kept_chars` counters for filter-rate monitoring.
  */
object LineFilter {

  /** The per-line keep predicate, exposed for reuse/testing. */
  def keepLine(t: Column, minWords: Int): Column =
    (length(t) > 0) &&
      (size(split(t, "\\s+")) >= minWords) &&
      t.rlike("[.!?\"”']$") &&
      !t.contains("{") &&
      !lower(t).contains("lorem ipsum") &&
      !lower(t).contains("javascript") &&
      !lower(t).contains("cookies")

  def apply(df: DataFrame, textCol: String, minWords: Int = 3): DataFrame = {
    val trimmed = transform(split(col(textCol), "\n"), l => trim(l))
    df.withColumn("__lines", trimmed)
      .withColumn("__kept", filter(col("__lines"),
        t => keepLine(t, minWords)))
      .select(df.columns.map(col) ++ Seq(
        when(size(col("__kept")) > 0, array_join(col("__kept"), "\n"))
          .as("clean_text"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        coalesce(aggregate(col("__kept"), lit(0L),
          (acc, t) => acc + length(t)), lit(0L)).as("kept_chars")): _*)
  }
}
