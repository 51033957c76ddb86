package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel over an event log — the product-analytics
  * operator relational engines lack natively (step k must occur
  * STRICTLY AFTER step k-1, so a plain per-type min-timestamp join
  * is wrong whenever a later step also happens early: a purchase
  * before the first click must not complete a click->purchase
  * funnel).
  *
  * Semantics (exact, engine-portable): step 1 of a user is their
  * (ts, event_id)-lexicographic FIRST event of the first step type;
  * step k is the first event of type k strictly after step k-1 in
  * the same (ts, event_id) order — event_id breaks timestamp ties
  * deterministically, so the funnel replays row-identically in SQL.
  * Output is total annotation over every user with at least one
  * step-type event: one step-timestamp column per step (null once
  * the funnel stalls) and the prefix depth reached.
  *
  * Scale shape: events filter to the step types AT THE SCAN (other
  * types never shuffle), then ONE exchange groups a user's step
  * events into a sorted array and the chase is a doc-local fold —
  * element_at(filter(...), first) per step over the array. The
  * per-user array is bounded by that user's step-event count (the
  * standard per-entity bound of every sessionization pipeline; a
  * pathological single-user log would hit the same bound in any
  * engine's funnel). No self-joins, no per-step shuffles: depth-N
  * funnels cost the same single exchange as depth-2.
  */
object Funnel {

  /** @param steps   ordered event types, e.g. signup -> view ->
    *                click -> purchase
    * @param tsCol   BIGINT timestamp column (any fixed unit)
    * @param idCol   unique event id — the deterministic tiebreak
    * @return (userCol, t_<step> for each step, depth) */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             idCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val grouped = events
      .filter(col(typeCol).isin(steps.map(x => x: Any): _*))
      .select(col(userCol),
        struct(col(tsCol).as("ts"), col(idCol).as("eid"),
          col(typeCol).as("etype")).as("__e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))

    def after(x: Column, prev: Column): Column =
      x.getField("ts") > prev.getField("ts") ||
        (x.getField("ts") === prev.getField("ts") &&
          x.getField("eid") > prev.getField("eid"))

    val chased = steps.zipWithIndex.foldLeft(grouped) { case (df, (st, i)) =>
      val cand =
        if (i == 0) filter(col("__evs"), x => x.getField("etype") === st)
        else {
          val prev = col(s"__s${i - 1}")
          when(prev.isNotNull,
            filter(col("__evs"),
              x => x.getField("etype") === st && after(x, prev)))
        }
      // get() is null-safe out of range (ANSI element_at throws)
      df.withColumn(s"__s$i", get(cand, lit(0)))
    }
    chased.select(
      col(userCol) +:
        steps.indices.map(i =>
          chased(s"__s$i").getField("ts").as(s"t_${steps(i)}")) :+
        steps.indices.map(i =>
          when(chased(s"__s$i").isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("int").as("depth"): _*)
  }

  /** Path analysis — the exploratory sibling of the fixed-step
    * funnel (the product-analytics "path explorer"/Sankey view):
    * count every length-`n` consecutive event-type sequence across
    * user journeys and rank the most-travelled paths. Where the
    * funnel asks "how many users did A then B then C", this asks
    * "what do users actually do" — the discovery pass that suggests
    * which funnels to define.
    *
    * Semantics (exact): each user's events order by (ts, id) —
    * event_id breaks timestamp ties as everywhere in this file —
    * and every window of `n` CONSECUTIVE events contributes one
    * '>'-joined path string. Counts are corpus-wide; ties in the
    * rank break lexicographically on the path.
    *
    * Scale shape: ONE exchange groups each user's (bounded)
    * journey; shingling is a doc-local array transform; the path
    * count is a map-combined aggregation whose key space is bounded
    * by |event types|^n (tiny), so the final exchange carries
    * counts, not journeys; top-k is a TakeOrdered merge.
    * @return (path, n_paths, rank) — the k most-travelled paths */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, typeCol: String, n: Int = 3,
               k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1, "need positive path length and k")
    import org.apache.spark.sql.expressions.Window
    val paths = events
      .select(col(userCol).as("u"),
        struct(col(tsCol).as("ts"), col(idCol).as("eid"),
          col(typeCol).as("etype")).as("__e"))
      .groupBy(col("u"))
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(explode(when(size(col("__evs")) >= n,
        // length-n windows: slice at each start, join types with '>'
        transform(sequence(lit(0), size(col("__evs")) - n), s =>
          concat_ws(">", transform(slice(col("__evs"), s + 1, lit(n)),
            e => e.getField("etype"))))).otherwise(array()))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
    // constant non-foldable partition key (the q_rrf discipline): the
    // frame is the path-count table, bounded by |event types|^n —
    // pinning one partition states that in the plan without the
    // unpartitioned-window warning
    paths
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("n_paths") * 0)
        .orderBy(col("n_paths").desc, col("path").asc)).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Cohort retention triangle — the funnel's aggregate sibling:
    * each user's cohort is the period (ts div `periodLen`, exact
    * integer division) of their FIRST event; cell (cohort, offset)
    * counts the cohort's users active again `offset` periods later.
    *
    * Scale shape: the corpus collapses to DISTINCT (user, period)
    * pairs in one map-combined aggregation (bounded by users x
    * active periods, tiny next to the event log); the cohort lookup
    * is a self-aggregation of that pair table joined back on user —
    * both sides already hash on user_id, and the pair table's
    * distinctness makes the final count a plain count(*), no
    * count-distinct exchange. Nothing wider than three integers ever
    * shuffles.
    * @return (cohort, offset, n_users) */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                periodLen: Long): DataFrame = {
    require(periodLen > 0, "periodLen must be a positive tick count")
    val up = events.select(col(userCol).as("user_id"),
        expr(s"`$tsCol` div $periodLen").as("period"))
      .distinct()
    val cohort = up.groupBy(col("user_id"))
      .agg(min(col("period")).as("cohort"))
    up.join(cohort, Seq("user_id"))
      .select(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
