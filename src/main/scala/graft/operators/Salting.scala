package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks. AQE's skew-join handling covers
  * the sort-merge case at runtime; these are the explicit forms for
  * when a hot key is known ahead of time (the classic power-law user
  * or null-heavy foreign key at corpus scale).
  */
object Salting {

  /** Skew-safe equi-join: the skewed (large, hot-keyed) side gets a
    * random salt in [0, buckets); the other side is replicated across
    * all salt values; the join key becomes (key, salt), splitting a
    * hot key's rows over `buckets` reducers. Semantically identical
    * to `skewed.join(other, key)` for any inner equi-join.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    val salted = skewed.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-tier skew join — the production form of [[saltedJoin]]:
    * only rows whose key is in `hotKeys` pay the salt/replicate cost;
    * everything else takes the plain equi-join path. The naive form
    * replicates the entire build side `buckets` times; here the
    * replication factor applies to the handful of hot keys only, so
    * the extra shuffle volume is O(hot rows x buckets) regardless of
    * corpus size. Semantically identical to `skewed.join(other, key)`
    * for any inner equi-join (the two tiers partition the key space).
    *
    * Hot keys are an explicit argument: at 100 TB you know them
    * (power-law user ids, null-ish defaults) or detect them with a
    * cheap sampled count; AQE's skew handling is the runtime fallback
    * when you don't.
    */
  def hotKeySaltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                       hotKeys: Seq[Any], buckets: Int = 8): DataFrame = {
    val isHot = col(key).isin(hotKeys: _*)
    val hot = saltedJoin(skewed.filter(isHot), other.filter(isHot), key, buckets)
    val cold = skewed.filter(!isHot).join(other.filter(!isHot), Seq(key))
    hot.unionByName(cold)
  }

  /** Sampled hot-key detection — the cheap pre-pass that feeds
    * [[hotKeySaltedJoin]] when the hot keys are NOT known a priori.
    * One job over a `fraction` sample: per-key counts aggregate
    * map-side, the top `maxKeys` come back with a distributed
    * take-ordered (never a full collect of the key space), and the
    * sample total rides the same job as an observed metric. A key is
    * "hot" when its sampled share exceeds `hotShare` — at power-law
    * scale the hot set is a handful of keys, so the driver holds
    * O(maxKeys), independent of corpus size or key cardinality.
    */
  def detectHotKeys(df: DataFrame, key: String, fraction: Double = 0.05,
                    hotShare: Double = 0.01, maxKeys: Int = 32,
                    seed: Long = 42): Seq[Any] = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0,1], got $fraction")
    val counts = df.select(col(key)).filter(col(key).isNotNull)
      .sample(withReplacement = false, fraction, seed)
      .groupBy(col(key)).agg(count(lit(1)).as("__c"))
    val obs = org.apache.spark.sql.Observation()
    // orderBy+limit plans as TakeOrdered: every partition is scanned,
    // so the observed total covers the whole sample in the same action
    val top = counts.observe(obs, sum(col("__c")).as("total"))
      .orderBy(col("__c").desc).limit(maxKeys).collect()
    val total = Option(obs.get("total")).map(_.asInstanceOf[Long]).getOrElse(0L)
    if (total == 0L) Seq.empty
    else top.filter(_.getLong(1).toDouble / total >= hotShare).map(_.get(0)).toSeq
  }

  /** [[hotKeySaltedJoin]] with the hot set detected automatically via
    * [[detectHotKeys]]; falls back to the plain equi-join when the
    * sample shows no skew (no replication cost on well-behaved data).
    * Semantically identical to `skewed.join(other, key)` either way.
    */
  def autoSaltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                     buckets: Int = 8, fraction: Double = 0.05,
                     hotShare: Double = 0.01): DataFrame = {
    val hot = detectHotKeys(skewed, key, fraction, hotShare)
    if (hot.isEmpty) skewed.join(other, Seq(key))
    else hotKeySaltedJoin(skewed, other, key, hot, buckets)
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate
    * on (key, salt), then final aggregate on key. For algebraic
    * aggregates this is what map-side partial aggregation already
    * does; the explicit form helps when the partial state is large
    * (collect_list-style) and one key dominates.
    */
  def saltedCount(df: DataFrame, key: Column, buckets: Int = 8): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("cnt"))

  /** Exact equi-join output-size prediction — the other number you
    * want BEFORE committing a corpus-scale shuffle (alongside
    * [[skewStats]]' per-key view): the join's output cardinality is
    * exactly Σ_k cnt_left(k) · cnt_right(k), computable from the two
    * per-key count relations at a fraction of the join's own cost
    * (counts shuffle one row per distinct key; the join would
    * shuffle every row and materialize the product). Also reports
    * the matched-key count and the single heaviest key's
    * contribution — the "is this join a fan-out bomb" one-row
    * answer.
    *
    * @return one row: (n_keys_matched, est_rows, max_key_rows) */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      key: String): DataFrame = {
    def counts(df: DataFrame) = df.select(col(key))
      .filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__c"))
    counts(left).withColumnRenamed("__c", "__cl")
      .join(counts(right).withColumnRenamed("__c", "__cr"), Seq(key))
      .agg(count(lit(1)).as("n_keys_matched"),
        coalesce(sum(col("__cl") * col("__cr")), lit(0L)).as("est_rows"),
        coalesce(max(col("__cl") * col("__cr")), lit(0L))
          .as("max_key_rows"))
  }

  /** Exact skew diagnostic for a join/group key — the measurement
    * half of [[autoSaltedJoin]]'s sampling heuristic, run when you
    * want the real numbers before committing a 100 TB shuffle: the
    * `topN` heaviest keys with their exact count, corpus share in
    * e4 fixed point (integer 10000ths — no float boundary), and the
    * salt bucket count that would bound any one (key, salt) task at
    * `targetPerBucket` rows (ceil-divide, min 1).
    *
    * Scale shape: ONE map-combined count aggregation over the key
    * (the shuffle carries one row per distinct key), slot-persisted
    * so the total and the top-N ride one materialization; the top-N
    * is TakeOrdered (bounded), and the rank window runs over those
    * `topN` rows with a non-foldable constant partition key — bounded
    * by construction, no unpartitioned-window scale pattern.
    * @return (rank, key, cnt, share_e4, salt) */
  def skewStats(df: DataFrame, key: String, topN: Int = 20,
                targetPerBucket: Long = 10000L): DataFrame = {
    require(topN >= 1 && targetPerBucket >= 1)
    val counts = PersistSlots.swap("skewStats",
      df.select(col(key)).filter(col(key).isNotNull)
        .groupBy(col(key)).agg(count(lit(1)).as("cnt")))
    // coalesce: an empty (or all-null-key) input sums to NULL, and a
    // bare getLong would NPE instead of returning the empty report
    val total = counts.agg(coalesce(sum(col("cnt")), lit(0L)))
      .collect()(0).getLong(0)
    // constant-valued but NON-FOLDABLE partition key (cnt is
    // non-nullable, so `cnt * 0` folds to a literal and Catalyst
    // strips the spec, reinstating the unpartitioned-window warning;
    // there is no x % 1 simplification) — the frame is the <= topN
    // TakeOrdered rows, bounded by construction
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("cnt"), lit(1L)))
      .orderBy(col("cnt").desc, col(key).asc)
    def idiv(a: Column, n: Column): Column = IntMath.idivTrunc(a, n)
    counts
      .orderBy(col("cnt").desc, col(key).asc).limit(topN)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(key), col("cnt"),
        // decimal-widened numerator: cnt is a corpus-scale key count,
        // cnt * 10000 in LONG wraps past ~9.2e14 rows per key
        IntMath.scaledDivTrunc(col("cnt"), 10000L, lit(math.max(1L, total)))
          .as("share_e4"),
        greatest(lit(1L),
          idiv(col("cnt") + lit(targetPerBucket - 1), lit(targetPerBucket)))
          .as("salt"))
  }
}
