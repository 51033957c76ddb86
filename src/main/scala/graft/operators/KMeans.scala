package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantized Lloyd's k-means over an embedding column — the
  * clustering step behind semantic dedup and corpus bucketing in a
  * training-data pipeline (cluster first, then compare only within a
  * cluster: the join never goes all-pairs).
  *
  * All arithmetic is exact: vectors quantize to integer milliunits
  * (`floor(x * 1000)`), distances are integer sums of squares, and
  * the only division (centroid mean) is a single IEEE double divide
  * of two exact integers — deterministic to the bit in any engine,
  * so assignments hash-match an independent SQL replay. Float
  * k-means diverges across engines on summation order; quantized
  * k-means is reproducible, which curation pipelines value more than
  * the third decimal of a centroid.
  *
  * Scale shape: assignment is a narrow map against broadcast
  * centroid literals (k * dim values); the centroid update is one
  * map-combined aggregation on (cluster, position) — rows shuffle as
  * k * dim partial sums per task, not as vectors. The driver only
  * ever holds k * dim longs (the centroids), never data: at 100 TB
  * the plan is identical. Iterations are bounded and small (Lloyd's
  * converges fast; curation uses 2-5 passes).
  */
object KMeans {

  /** Integer milliunit quantization of a float/double vector. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000).cast("long"))

  /** The k-means parameter-scaling discipline as CODE: cluster count
    * for a target expected cluster size. Within-cluster comparison
    * (semantic dedup's self-join) is quadratic in cluster size, so
    * k ~ n / B keeps total compare work ~n * B — linear in n at
    * fixed B, the IVF tradeoff. The driver holds k * dim centroid
    * longs (e.g. k = 10^6 at dim 64 ≈ 512 MB), so the clamp keeps
    * auto-k inside a sane driver budget; beyond that, raise
    * `targetCluster` or supply k explicitly.
    *
    * n = 500 -> 8 at B=64; 50 k -> 782; 5 M -> 78 125. */
  def autoK(n: Long, targetCluster: Long = 64L, maxK: Int = 1 << 20): Int = {
    require(n > 0 && targetCluster > 0, "need positive n and target cluster")
    // Exact integer ceil-divide (no double rounding at huge n) so the
    // oracle's `(count(*) + B - 1) // B` resolves the identical k.
    val k = n / targetCluster + (if (n % targetCluster == 0) 0L else 1L)
    math.min(maxK.toLong, math.max(2L, k)).toInt
  }

  /** Squared L2 distance to each centroid (exact integer). Two
    * physically different, arithmetically identical forms:
    *
    *  - k <= exprMax: per-centroid expressions expanded as
    *    |v|^2 - 2 v.c + |c|^2, each one codegen'd
    *    [[graft.plans.DotProductLong]] kernel against centroid
    *    literals — |v|^2 once per row, |c|^2 folded on the driver.
    *    The oracle-replayable form.
    *  - k > exprMax: ONE codegen'd kernel expression
    *    ([[graft.plans.NearestCentroidLong]]) over the embedded
    *    centroid matrix. Thousands of per-centroid expression
    *    branches would blow generated-method size past codegen limits
    *    (autoK at n = 10^5..10^9 wants k in the
    *    thousands-to-millions), while the kernel stays one compact
    *    k×dim loop inside whole-stage codegen. Same integer sums,
    *    same smallest-id tiebreak (ids scanned sorted, strict <), so
    *    results are bit-identical — pinned by Round5OpsSpec.
    *
    * Default exprMax = 0 (optimization round 17; was 256): the
    * kernel form is now the default at EVERY k. The unrolled form
    * embeds k centroid literals + 2k expression nodes per assignment
    * — at k=8..16 that alone fattened every k-means/PQ plan (plan
    * build, canonicalization, per-task deserialization all O(plan)),
    * and the centroid payload now rides a per-executor broadcast ref
    * inside the kernel ([[graft.plans.BcRef]]) instead of per-task
    * literals. Results unchanged at any switch point (the
    * Round5OpsSpec pin); the expression form stays behind the
    * parameter as the oracle-replayable reference and for the spec's
    * differential runs.
    */
  private[graft] def assignTo(q0: DataFrame, centroids: Map[Int, Seq[Long]],
                              exprMax: Int = 0): DataFrame = {
    import graft.plans.VectorExpressions.dotLong
    val ids = centroids.keys.toSeq.sorted
    if (ids.length <= exprMax) {
      val q = q0.withColumn("__vn", dotLong(col("__q"), col("__q")))
      val dists = array(ids.map { i =>
        val c = centroids(i)
        col("__vn") - lit(2L) * dotLong(col("__q"), typedlit(c)) +
          lit(c.map(x => x * x).sum)
      }: _*)
      // ties assign to the smallest surviving cluster id:
      // array_position takes the FIRST index of the minimum and `ids`
      // is sorted, which is what the oracle's ORDER BY d, c replays
      q.withColumn("__d", dists)
        .withColumn("dist", array_min(col("__d")))
        // dist null (null input vector) -> cluster null too, matching
        // the kernel path's null struct; unguarded, array_position
        // over the all-null distance array resolves to position 1 and
        // would emit cluster 0 with a null dist
        .withColumn("cluster",
          when(col("dist").isNotNull,
            element_at(typedlit(ids),
              array_position(col("__d"), array_min(col("__d"))).cast("int"))))
        .drop("__d", "__vn")
    } else {
      // ONE codegen'd kernel expression against the embedded centroid
      // matrix (graft.plans.NearestCentroidLong): a compact k*dim loop
      // that inlines into the surrounding whole-stage-codegen
      // projection — no per-row boxed ser/de, and generated-method
      // size does not grow with k (the per-centroid expansion above
      // would blow past JIT limits at autoK's thousands of clusters).
      // Null vector or null element -> null struct, exactly the
      // expression form's null-propagating arithmetic — the two paths
      // must stay bit-identical on ALL inputs (pinned by Round5OpsSpec)
      val assigned = graft.plans.VectorExpressions.nearestCentroidLong(
        col("__q"), ids.map(i => (i, centroids(i))))
      q0.withColumn("__a", assigned)
        .withColumn("cluster", col("__a").getField("cluster"))
        .withColumn("dist", col("__a").getField("dist"))
        .drop("__a")
    }
  }

  /** Exact per-(cluster, dim) coordinate sums and member counts of
    * an assignment — the sufficient statistics BOTH the Lloyd update
    * and the incremental fold ([[updateAssign]]) consume; one
    * aggregation, k*dim result rows. */
  private def clusterStats(assigned: DataFrame): Map[(Int, Int), (Long, Long)] =
    assigned
      .select(col("cluster"), posexplode(col("__q")).as(Seq("pos", "val")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("val")).as("s"), count(lit(1)).as("n"))
      .collect() // k * dim rows — centroid statistics, not data
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  /** Componentwise floor(sum / count) over cluster statistics — the
    * ONE definition of the centroid-mean arithmetic (fit and ingest
    * paths cannot diverge). */
  private def floorMeans(st: Map[(Int, Int), (Long, Long)])
  : Map[Int, Seq[Long]] =
    st.groupBy(_._1._1).map { case (c, m) =>
      c -> m.toSeq.sortBy(_._1._2)
        .map { case (_, (s, n)) => math.floor(s.toDouble / n).toLong }
    }

  /** New centroid per surviving cluster: componentwise
    * floor(sum / count). */
  private[operators] def update(assigned: DataFrame): Map[Int, Seq[Long]] =
    floorMeans(clusterStats(assigned))

  /** [[fit]] keeping the quantized vector column `__q` alongside the
    * assignment — callers that compare vectors within clusters
    * (semantic dedup) read it directly instead of re-scanning and
    * re-joining the corpus. */
  private[operators] def fitAssigned(df: DataFrame, idCol: String,
                                     vecCol: String, k: Int,
                                     steps: Int): DataFrame = {
    require(steps >= 1, "k-means needs at least one assignment pass")
    val q = df.select(col(idCol), quantize(col(vecCol)).as("__q"))
    val init: Map[Int, Seq[Long]] =
      q.orderBy(col(idCol).asc).limit(k).collect()
        .map(_.getSeq[Long](1).toSeq).zipWithIndex
        .map { case (v, i) => i -> v }.toMap
    var centroids = init
    var assigned = assignTo(q, centroids)
    for (_ <- 2 to steps) {
      centroids = update(assigned)
      assigned = assignTo(q, centroids)
    }
    assigned
  }

  /** Run `steps` assignment passes (a centroid update between
    * consecutive passes); initial centroids are the quantized
    * vectors of the k smallest ids — deterministic, so the whole fit
    * is a pure function of the data. Returns one row per input row:
    * (idCol, cluster, dist). */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int, steps: Int = 2): DataFrame =
    fitAssigned(df, idCol, vecCol, k, steps)
      .select(col(idCol), col("cluster"), col("dist"))

  /** Prototypicality pruning (the D4 recipe, Tirumala et al. 2023:
    * SemDeDup then drop the most PROTOTYPICAL items per cluster —
    * "Beyond neural scaling laws"'s SSL-prototypes metric): cluster
    * the corpus, rank each item by its exact integer distance to its
    * centroid, and mark the closest `dropPct` percent of every
    * cluster dropped. Items nearest a centroid are the cluster's
    * redundant core — semantically interchangeable with their
    * neighbors — while far items carry the cluster's diversity, so
    * pruning the core trims tokens with the least information loss.
    * Total annotation: every row comes back with its cluster, exact
    * distance, within-cluster prototypicality rank (1 = most
    * prototypical, ties to the smaller id) and a kept flag —
    * downstream picks `kept = 1` or re-thresholds without refitting.
    *
    * Scale shape: [[fit]]'s narrow assignment scan does the corpus
    * work; the rank is ONE exchange of (id, cluster, dist) triples —
    * never vectors — partitioned by cluster, and under the
    * k ~ n / B sizing discipline ([[autoK]]) each cluster sorts ~B
    * rows, so no partition outgrows memory however big the corpus.
    * The drop count uses integer arithmetic (n * dropPct / 100,
    * floored) — engine-portable to the row. */
  def protoPrune(df: DataFrame, idCol: String, vecCol: String,
                 k: Int, steps: Int = 2, dropPct: Int = 25): DataFrame = {
    require(dropPct >= 0 && dropPct <= 100, s"dropPct=$dropPct not in [0,100]")
    import org.apache.spark.sql.expressions.Window
    val byDist = Window.partitionBy(col("cluster"))
      .orderBy(col("dist").asc, col(idCol).asc)
    val whole = Window.partitionBy(col("cluster"))
    fit(df, idCol, vecCol, k, steps)
      .withColumn("proto_rank", row_number().over(byDist).cast("long"))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("kept",
        (col("proto_rank") > expr(s"__n * $dropPct div 100")).cast("int"))
      .drop("__n")
  }

  /** Cluster-bucketed semantic near-dup pairs: k-means buckets the
    * corpus, then exact quantized cosine runs only within a bucket —
    * the all-pairs comparison becomes k cluster-local self-joins
    * (same family as LSH bucketing, but buckets are data-adaptive).
    * Near-identical vectors always share a cluster (they are closer
    * to each other than to any centroid gap), so recall loss is
    * confined to borderline pairs near the threshold.
    *
    * Scaling discipline: within-cluster comparison is quadratic in
    * cluster SIZE, so k must grow with the corpus — pick
    * k ~ n / B for a target bucket size B and the total work stays
    * n * B (linear in n), exactly the IVF tradeoff — `k = 0` selects
    * that discipline in code via [[autoK]]. The bench query pins
    * k = 8 for oracle determinism, which is why its scale-probe
    * ratio grows superlinearly with sf — a property of the frozen k,
    * not the operator; the `_auto` probe twin runs the auto path. */
  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, steps: Int = 2,
                           minCosE4: Long = 9000L,
                           nEstimate: Long = 0L): DataFrame = {
    // k = 0 selects the scaling discipline in code: autoK from the
    // corpus size (nEstimate if given, else one count() — a narrow
    // scan, cheap next to the cluster-local self-join it right-sizes).
    // An empty corpus short-circuits to an empty pair set: the frozen-k
    // path returns empty there too, and autoK requires n > 0.
    val n = if (k > 0) -1L else if (nEstimate > 0) nEstimate else df.count()
    if (k <= 0 && n == 0)
      return df.select(col(idCol).as("id_a"), col(idCol).as("id_b"),
        lit(0).as("cluster")).limit(0)
    val kk = if (k > 0) k else autoK(n)
    // persisted, single-slot (PersistSlots): the self-join reads this
    // frame as BOTH sides, and the assignment chain (scan + quantize
    // + k codegen'd distance kernels per row) would otherwise run
    // once per side. Each call recomputes (no memoization — a cache
    // keyed on the logical plan would silently serve stale
    // assignments if the files at a path were rewritten mid-session,
    // and would hide the fit cost from repeated-trial benchmarks);
    // the PREVIOUS invocation's frame is unpersisted by the swap, so
    // repeated calls (bench median-of-3, the scale probe) never
    // stack cached copies in the block manager.
    import graft.plans.VectorExpressions.dotLong
    val assigned = PersistSlots.swap("kmeans.assigned",
      fitAssigned(df, idCol, vecCol, kk, steps)
        .select(col(idCol).as("id"), col("cluster"), col("__q"))
        .withColumn("__n", dotLong(col("__q"), col("__q"))))
    val a = assigned.select(col("id").as("id_a"), col("cluster"),
      col("__q").as("__qa"), col("__n").as("__na"))
    val b = assigned.select(col("id").as("id_b"), col("cluster"),
      col("__q").as("__qb"), col("__n").as("__nb"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__dot", dotLong(col("__qa"), col("__qb")))
      // exact integer comparison: cos >= t  <=>  dot > 0 and
      // dot^2 * 1e8 >= t_e4^2 * na * nb — no float rounding at the
      // threshold boundary, so the oracle can never disagree on a
      // borderline pair. Products reach ~1e24: decimal(38,0) in
      // Spark, HUGEINT in the oracle — both exact.
      .filter(col("__dot") > 0 &&
        col("__dot").cast("decimal(19,0)") * col("__dot").cast("decimal(19,0)") *
          lit(100000000L).cast("decimal(19,0)") >=
          lit(minCosE4 * minCosE4).cast("decimal(19,0)") *
            col("__na").cast("decimal(19,0)") * col("__nb").cast("decimal(19,0)"))
      .select(col("id_a"), col("id_b"), col("cluster"))
  }

  /** Incremental centroid maintenance — the INGEST companion of
    * [[fit]] (the dedup_incremental / knn_graph_ingest pattern for
    * clustering): the standing corpus keeps its fitted centroids,
    * and an arriving batch is absorbed with ONE mini-batch Lloyd
    * step (the web-scale k-means update, batch-granular): batch rows
    * assign to the nearest fitted centroid, every centroid moves to
    * the exact weighted mean floor((sum_base + sum_batch) /
    * (n_base + n_batch)) — folding SUMS, not already-floored means,
    * so the merge loses nothing and replays exactly — and the batch
    * re-assigns against the UPDATED centroids.
    *
    * Scale shape: the corpus pays [[fit]]'s assignment scans (which
    * a standing pipeline has already paid and slot-persisted); the
    * increment itself costs one batch-sized assignment scan plus two
    * k*dim aggregations. The corpus NEVER joins the batch — the
    * handoff is the k*dim centroid statistics, driver-scale by
    * construction. Double-precision caveat: the summed milliunit
    * coordinates must stay under 2^53 per (cluster, dim) — ~9e12
    * unit-norm members per cluster — before the mean divide; far
    * beyond any real cluster.
    *
    * @return the BATCH assignment (idCol, cluster, dist) against the
    *         updated centroids */
  def updateAssign(base: DataFrame, batch: DataFrame, idCol: String,
                   vecCol: String, k: Int, steps: Int = 2): DataFrame = {
    val baseStats = clusterStats(fitAssigned(base, idCol, vecCol, k, steps))
    // the fit's final centroids (floor means of the last assignment)
    val cents = floorMeans(baseStats)
    val qBatch = batch.select(col(idCol), quantize(col(vecCol)).as("__q"))
    val batchStats = clusterStats(assignTo(qBatch, cents))
    val merged: Map[Int, Seq[Long]] = cents.map { case (c, v) =>
      c -> v.indices.map { i =>
        val (sb, nb) = baseStats((c, i))
        val (sx, nx) = batchStats.getOrElse((c, i), (0L, 0L))
        math.floor((sb + sx).toDouble / (nb + nx)).toLong
      }
    }
    assignTo(qBatch, merged)
      .select(col(idCol), col("cluster"), col("dist"))
  }
}
