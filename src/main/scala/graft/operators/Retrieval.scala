package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson & Zaragoza 2009, the Okapi
  * weighting every lexical search stack runs) — the query side of the
  * inverted-index artifact `q_inverted_index` builds, and the recall
  * stage a RAG-style training pipeline pairs with the ANN operators.
  *
  * Engine-portable scoring: every per-term contribution is quantized
  * to integer micro-units BEFORE the per-document sum, so the sum is
  * exact integer arithmetic — no float-addition-order dependence
  * across partitions — and the whole ranking replays in SQL with the
  * same expression tree (identical IEEE association, floor at the
  * end).
  *
  * Scale shape: the corpus tokenizes once; only tokens matching the
  * query term set survive the explode (a narrow `isin` filter on a
  * literal — at 100 TB the posting rows crossing the tf/df exchanges
  * are bounded by query-term document frequency, not corpus size);
  * `N`/`avgdl` is one map-combined aggregate broadcast back as a
  * single row (a production deployment precomputes it as a corpus
  * statistic); the final top-k is TakeOrderedAndProject. Nothing
  * shuffles the corpus text.
  */
object Retrieval {

  /** Score `queryTerms` against `docs(textCol)`, returning the top
    * `topK` documents as (idCol, n_terms, score_e6) — score in
    * integer micro-units, ties broken by ascending id. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 requires at least one query term")
    import graft.functions.TextFunctions.words
    val toks = docs.select(col(idCol).as("id"),
      words(col(textCol)).as("__w"))
    val posts = toks
      .select(col("id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    scorePosts(toks, posts, idCol, k1, b, topK, perQuery = false)
  }

  /** BM25 with RM3-style pseudo-relevance feedback — the classic
    * query-expansion loop (Lavrenko & Croft's relevance models, the
    * form Anserini/Lucene ship as RM3): score the seed query, treat
    * the top `fbDocs` results as relevant, lift the `fbTerms`
    * most-frequent non-seed terms out of them, and rescore with the
    * expanded query. Expansion recovers vocabulary-mismatch recall
    * (documents about the topic that never use the seed words).
    *
    * Deterministic end-to-end: both ranking passes are [[bm25]]'s
    * integer micro-unit scores with id tiebreaks, and the expansion
    * pick orders by exact occurrence count then term — so the
    * expanded TERM SET (and thus the final ranking) replays in SQL.
    *
    * Scale shape: two corpus scans (the two BM25 passes — each the
    * [[bm25]] posting shape) plus one term count over the FEEDBACK
    * docs only (fbDocs documents — driver-bounded the way model
    * collects are; the expansion set is fbTerms strings).
    */
  def bm25Rm3(docs: DataFrame, idCol: String, textCol: String,
              queryTerms: Seq[String], fbDocs: Int = 5, fbTerms: Int = 3,
              k1: Double = 1.2, b: Double = 0.75,
              topK: Int = 20): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1, "need fbDocs >= 1, fbTerms >= 1")
    import graft.functions.TextFunctions.words
    val fb = bm25(docs, idCol, textCol, queryTerms, k1, b, topK = fbDocs)
      .select(col(idCol))
    val expansion = docs
      .join(fb, idCol)
      .select(explode(words(col(textCol))).as("term"))
      .filter(!col("term").isin(queryTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("term").asc)
      .limit(fbTerms)
      .collect().map(_.getString(0)).toSeq // fbTerms strings — driver-bounded
    bm25(docs, idCol, textCol, queryTerms ++ expansion, k1, b, topK)
  }

  /** Batched BM25: many queries at once — the production retrieval
    * workload. `queries` is (qidCol, termCol), one row per query
    * term; the union of query terms filters the corpus explode (one
    * broadcast semi-join instead of a literal `isin`), scores fan
    * out per query via a broadcast equi-join on term, and the top-k
    * is the bounded [[TopK]] aggregate PER QUERY — ≤ topK rows per
    * query per task cross the final exchange however many documents
    * match. One corpus scan total, any number of queries.
    * @return (qidCol, idCol, score_e6, rank) */
  def bm25Batch(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qidCol: String, termCol: String,
                k1: Double = 1.2, b: Double = 0.75,
                topK: Int = 10): DataFrame = {
    import graft.functions.TextFunctions.words
    val q = queries.select(col(qidCol).as("qid"), col(termCol).as("term"))
    val toks = docs.select(col(idCol).as("id"),
      words(col(textCol)).as("__w"))
    val posts = toks
      .select(col("id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .join(broadcast(q.select(col("term")).distinct()), Seq("term"),
        "left_semi")
    val perTerm = scorePosts(toks, posts, idCol, k1, b,
      topK, perQuery = true)
    val scored = perTerm.join(broadcast(q), Seq("term"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("s_e6")).as("score_e6"))
    TopK.perKey(scored, "qid", "id", "score_e6", topK)
      .select(col("qid").as(qidCol), col("id").as(idCol),
        col("score_e6").cast("long"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    * standard way to combine a lexical ranking with a vector ranking
    * (hybrid search) without score calibration: each list contributes
    * `1 / (k + rank)` per document, summed across lists. Quantized to
    * integer micro-units the contribution is `1000000 div (k + rank)`
    * — pure integer division on integer ranks, so the fused score is
    * EXACT in any engine (no float at any point; the knn/BM25 legs'
    * own determinism carries through their integer ranks).
    *
    * Inputs are already-bounded top-N lists (each ≤ N rows per
    * query) — the corpus-scale work lives in the legs ([[bm25]],
    * `Similarity.bruteForceTopK`/`lshTopK`); fusion itself touches
    * only lists-size rows, one small aggregation. `rankings` frames
    * need (idCol, rankCol); ranks start at 1. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse requires at least one ranking")
    val unioned = rankings
      .map(_.select(col(idCol).as("id"), col(rankCol).cast("long").as("rank")))
      .reduce(_ unionByName _)
    unioned
      .withColumn("contrib", expr(s"1000000 div ($kRrf + rank)"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("rrf_e6"))
      .orderBy(col("rrf_e6").desc, col("id").asc)
      .limit(topK)
      .select(col("id").as(idCol), col("n_lists"), col("rrf_e6"))
  }

  /** Batched [[rrfFuse]]: fuse per-query ranked lists for MANY
    * queries at once — the production hybrid-retrieval shape pairing
    * [[bm25Batch]] with a multi-query ANN leg. Same all-integer
    * contributions; the per-query top-k is the bounded
    * [[TopK]] aggregate (≤ topK rows per query per task cross the
    * final exchange). `rankings` frames need (qidCol, idCol,
    * rankCol); ranks start at 1 within each query.
    * @return (qidCol, idCol, rrf_e6, rank) */
  def rrfFuseBatch(rankings: Seq[DataFrame], qidCol: String, idCol: String,
                   rankCol: String, kRrf: Int = 60,
                   topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuseBatch requires at least one ranking")
    val unioned = rankings
      .map(_.select(col(qidCol).as("qid"), col(idCol).as("id"),
        col(rankCol).cast("long").as("rank")))
      .reduce(_ unionByName _)
    val scored = unioned
      .withColumn("contrib", expr(s"1000000 div ($kRrf + rank)"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("contrib")).as("rrf_e6"))
    // TopK's double order key is exact here: fused scores are
    // integers far below 2^53
    TopK.perKey(scored, "qid", "id", "rrf_e6", topK)
      .select(col("qid").as(qidCol), col("id").as(idCol),
        col("rrf_e6").cast("long"), col("rank"))
  }

  /** Shared scoring tail: tf/df/length-normalized per-term integer
    * micro-unit scores; `perQuery = false` sums per document and
    * take-orders (single-query form), `perQuery = true` returns the
    * per-(term, doc) score rows for the batch fan-out. */
  private def scorePosts(toks: DataFrame, posts: DataFrame, idCol: String,
                         k1: Double, b: Double, topK: Int,
                         perQuery: Boolean): DataFrame = {
    val tf = posts.groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df = rows of tf per term, as a WINDOW over the tf frame: one
    // posting-scale exchange on the term key instead of a second
    // corpus scan (a separate df aggregation re-reads the corpus —
    // column pruning differentiates the two agg subtrees, so not
    // even AQE's ReuseExchange can serve one from the other; probed)
    val withDf = tf.withColumn("df", count(lit(1))
      .over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
    val stats = toks.agg(count(lit(1)).as("n"),
      sum(size(col("__w")).cast("long")).as("sumdl"))
    // identical association as the SQL replay: idf = ln(1 + (n - df
    // + 0.5)/(df + 0.5)); sat = (tf*(k1+1)) / (tf + k1*((1-b) +
    // b*(dl*n/sumdl))); s_e6 = floor((idf*sat)*1e6)
    val idf = log(lit(1.0) +
      ((col("n") - col("df")) + lit(0.5)) / (col("df") + lit(0.5)))
    val rel = (col("dl") * col("n")).cast("double") /
      col("sumdl").cast("double")
    // k1+1 stays an IEEE ADD of the two literals (not a pre-computed
    // Scala constant): the SQL replay writes `(k1 + 1.0)` too, so
    // both engines round the same operation, not the same decimal
    val sat = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * rel))
    val base = withDf
      .crossJoin(broadcast(stats))
      .select(col("term"), col("id"),
        floor(idf * sat * lit(1000000.0)).cast("long").as("s_e6"))
    if (perQuery) base
    else base
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("id").asc)
      .limit(topK)
      .select(col("id").as(idCol), col("n_terms"), col("score_e6"))
  }
}
