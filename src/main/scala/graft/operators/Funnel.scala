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
