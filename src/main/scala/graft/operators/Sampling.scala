package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus sampling for dataset curation — seeded, so a sampling
  * decision is an artifact of the pipeline config, not of the run.
  * Both forms are narrow (per-row coin flips with a partition-stable
  * seed): no shuffle, no driver pass, any scale.
  */
object Sampling {

  /** Seeded Bernoulli sample (without replacement). */
  def bernoulli(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Stratified sample: per-stratum keep fractions (e.g. downsample
    * boilerplate-heavy sources, keep all rare-language docs). Keys
    * absent from `fractions` are dropped — the common curation
    * default. */
  def stratified(df: DataFrame, keyCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(keyCol, fractions, seed)

  /** Deterministic hash sample: keeps a row iff md5(id) mod b < k —
    * unlike seeded RNG sampling this is stable across Spark versions,
    * engines, and row order, so it can be oracle-checked and
    * consistently re-derived (the trick behind stable eval-set
    * holdouts). Keeps ~k/b of rows. */
  def hashSample(df: DataFrame, idCol: String, keep: Int, outOf: Int): DataFrame =
    df.filter(Packing.shardId(idCol, outOf) < keep)
}
