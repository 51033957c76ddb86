package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Similarity search over the embeddings table (Array[Float], 64-d).
  * knn_cosine is exact and oracle-checked; knn_lsh is the
  * approximate scale path (no SQL oracle — the driver records a
  * rows-only check; recall vs brute force is pinned in
  * SimilaritySpec).
  */
object VectorQueries {

  val DIM = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_cosine" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 8), emb,
        "vec_id", "vec_id", "embedding", k = 10)
    }),

    "knn_lsh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshTopK(
        emb.filter(col("vec_id") < 8), emb,
        "vec_id", "vec_id", "embedding", dim = DIM, k = 10)
    })
  )

  val oracles: Map[String, String] = Map(
    "knn_cosine" ->
      """WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        list_cosine_similarity(q.e, c.e) AS sim
        |      FROM q JOIN c ON q.vec_id <> c.vec_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY round(sim, 6) DESC, neighbor_id ASC) AS rank
        |      FROM s)
        |SELECT query_id, neighbor_id, round(sim, 4) AS sim, rank
        |FROM r WHERE rank <= 10""".stripMargin
    // knn_lsh: intentionally no oracle (approximate operator)
  )
}
