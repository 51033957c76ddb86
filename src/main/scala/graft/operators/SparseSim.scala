package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words

/** Sparse TF-IDF cosine similarity between documents — the
  * term-weighted complement of the set-based Jaccard family: two
  * documents are near-duplicates (or near-topical-twins) when the
  * cosine of their TF-IDF vectors clears a threshold. Classic
  * all-pairs-similarity-search territory (Bayardo et al., "Scaling
  * Up All Pairs Similarity Search", WWW 2007): materializing the
  * vectors is easy, the quadratic pair space is the problem.
  *
  * Shape: the sparse vectors live as a (doc, term, weight) relation;
  * the dot product is a TERM-KEY self-join + sum of weight products,
  * so only documents sharing a term ever meet — and the
  * document-frequency cap drops the high-df terms that (a) carry
  * near-zero IDF weight anyway and (b) generate df² join fan-out
  * (the DISCO/DIMSUM magnitude-pruning insight, arXiv:1304.1467, in
  * its exact-integer form). df is computed as a window count over
  * the term key — one exchange, and the relation exits partitioned
  * by term, which is exactly the self-join's key, so the join
  * reuses the partitioning instead of shuffling twice.
  *
  * Arithmetic is the repo-standard fixed point: weight =
  * floor(tf · ln(n/df) · 10⁴) as a long (same expression as
  * text_tfidf's green oracle), dot products and norms are integer
  * sums, and the single float boundary is the final
  * round(dot/√(na·nb), 4) — replayable in SQL.
  *
  * At 100 TB: one corpus scan tokenizes, one exchange on term (df
  * window + self-join), pair fan-out bounded by maxDocFreq² per
  * term. The cap is a documented approximation exactly like
  * [[Dedup.ngramJaccardPairs]]'s: capped terms vanish from BOTH
  * sides (weights and norms), so the observable semantics are
  * "cosine over the df-capped vocabulary".
  */
object SparseSim {

  /** Pairs with df-capped TF-IDF cosine >= minCos.
    * @return (id_a, id_b, cos 4dp), id_a < id_b */
  def tfidfCosinePairs(df: DataFrame, idCol: String, textCol: String,
                       minCos: Double = 0.8,
                       maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val n = df.count() // one long on the driver: the idf denominator
    val tf = df.select(col(idCol).as("id"),
        explode(words(col(textCol))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("__df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val capped =
      if (maxDocFreq == Int.MaxValue) withDf
      else withDf.filter(col("__df") <= maxDocFreq)
    // ln(n/n) = 0 terms weight to 0 and can't move a dot product or
    // norm — dropping them here is exact, not an approximation
    val w = capped
      .withColumn("w",
        floor(col("tf") * log(lit(n).cast("double") / col("__df")) * 10000)
          .cast("long"))
      .filter(col("w") > 0)
      .select(col("id"), col("term"), col("w"))
    val t = PersistSlots.swap("sparsesim.weights", w)
    val norms = t.groupBy(col("id")).agg(sum(col("w") * col("w")).as("n2"))
    val dots = t.select(col("id").as("id_a"), col("term"), col("w").as("wa"))
      .join(t.select(col("id").as("id_b"), col("term"), col("w").as("wb")),
        Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wa") * col("wb")).as("dotp"))
    dots
      .join(norms.select(col("id").as("id_a"), col("n2").as("na")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("n2").as("nb")), "id_b")
      .withColumn("cos", round(col("dotp").cast("double")
        / sqrt(col("na").cast("double") * col("nb").cast("double")), 4))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
