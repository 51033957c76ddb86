package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-mixture reweighting — the "what should the sampler draw
  * next epoch" step of a training-data pipeline, DoReMi-shaped (Xie
  * et al. 2023: upweight domains where the model shows the most
  * unexploited headroom) but LINEARIZED into integer fixed point so
  * the whole update replays bit-identically in SQL: the published
  * exponentiated-gradient step `w_i ∝ base_i · exp(η · excess_i)`
  * becomes the first-order form `w_i ∝ base_i · (1 + η · excess_i)`
  * — same fixed point direction, same ordering of domains for small
  * η·excess, and exact BIGINT arithmetic end to end (libm `exp`
  * differs in the low bits across engines; an integer multiply does
  * not).
  *
  * Excess here is hardness headroom measured against the corpus:
  * `excess_i = max(0, mean_nll_i − global_mean_nll)` in micro-nats —
  * domains scoring worse than the corpus mean under the scoring
  * model get upweighted, domains at or below the mean keep their
  * base share (the max(0,·) is DoReMi's clamp). Base shares are
  * token-mass shares, so the update perturbs the natural sampling
  * distribution rather than a uniform one.
  *
  * Scale shape: one map-combined aggregation over the per-document
  * frame (|domains| output rows), one scalar global aggregate joined
  * back by broadcast, then arithmetic on |domains| rows — nothing
  * further touches the corpus. The caller supplies per-document NLL
  * (one scoring scan under a broadcast LM, the q_perplexity path),
  * so the whole query is: score scan → domain agg → driver-scale
  * arithmetic.
  *
  * Overflow: base_share_e6 ≤ 1e6; excess_e6 is bounded by the
  * scoring model's worst per-token cost (ln of the backoff floor,
  * ≈ 3e7 µnats for a 1e12-token corpus), so the weight
  * `base·(1e6 + η·excess)` stays ≤ ~1e14 and the normalizing sum is
  * safe through ~1e4 domains — domains are sources/hosts, orders of
  * magnitude below that. The ×10000 renormalization peaks at ~1e18,
  * inside BIGINT.
  */
object Mixture {

  /** One linearized reweighting step over per-document scores.
    *
    * @param perDoc one row per document: `domainCol`, `tokCol`
    *               (token count, ≥ 0), `nllCol` (avg NLL in
    *               micro-nats; NULL for unscored docs — they count
    *               toward mass but not hardness)
    * @param etaE0  learning rate as an integer multiplier per
    *               micro-nat of excess (η in the linearized update;
    *               2 ⇒ a domain 0.5 nat above the mean gets a 2×
    *               base-share boost)
    * @return one row per domain: n_docs, n_scored, sum_tok,
    *         mean_nll_e6 (NULL when unscored), excess_e6,
    *         base_share_e6, new_share_e4 — new shares sum to ≤ 1e4
    *         (flooring loss < |domains|)
    */
  def domainReweightStep(perDoc: DataFrame, domainCol: String,
                         nllCol: String, tokCol: String,
                         etaE0: Long = 2L): DataFrame = {
    require(etaE0 >= 0, s"etaE0 must be >= 0, got $etaE0")
    // slot-persisted: the global-mean scalar below is a SECOND
    // consumer of this frame, and without the cache its lineage
    // would re-run the corpus scoring scan (the contaminationMatrix
    // lesson) — the persisted frame is |domains| rows, not corpus
    val dom = PersistSlots.swap("mixture.domainStats", perDoc
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        count(col(nllCol)).as("n_scored"),
        sum(col(tokCol)).as("sum_tok"),
        sum(col(nllCol)).as("__sum_nll")))
    // global mean over SCORED docs and total token mass: two scalar
    // aggregates over the |domains|-row frame, broadcast back
    val g = dom.agg(
      expr("CASE WHEN sum(n_scored) > 0 THEN sum(__sum_nll) div sum(n_scored) END")
        .as("__g_e6"),
      sum(col("sum_tok")).as("__tt"))
    dom.crossJoin(broadcast(g))
      .withColumn("mean_nll_e6",
        when(col("n_scored") > 0, expr("__sum_nll div n_scored")))
      // greatest/coalesce both skip NULLs identically in Spark and
      // DuckDB: an unscored domain (or an unscored corpus) gets
      // excess 0, never NULL
      .withColumn("excess_e6",
        coalesce(greatest(col("mean_nll_e6") - col("__g_e6"), lit(0L)),
          lit(0L)))
      .withColumn("base_share_e6",
        when(col("__tt") > 0, expr("sum_tok * 1000000 div __tt"))
          .otherwise(lit(0L)))
      .withColumn("__w",
        col("base_share_e6") * (lit(1000000L) + lit(etaE0) * col("excess_e6")))
      // normalization over the |domains|-row frame: a global window
      // here is one tiny single-partition pass over domain rows, not
      // corpus data (constant-key partition spec keeps the planner
      // from warning about an empty one — the ccnetBuckets idiom)
      // coalesce: length(NULL) is NULL and a NULL partition key would
      // split a NULL-domain row into its own window — normalizing it
      // against only itself — while the oracle's scalar sum is global
      .withColumn("__sw", sum(col("__w")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(coalesce(length(col("domain")), lit(0)) * 0)))
      .withColumn("new_share_e4",
        when(col("__sw") > 0, expr("__w * 10000 div __sw"))
          .otherwise(lit(0L)))
      .select(col("domain").as(domainCol), col("n_docs"), col("n_scored"),
        col("sum_tok"), col("mean_nll_e6"), col("excess_e6"),
        col("base_share_e6"), col("new_share_e4"))
  }
}
