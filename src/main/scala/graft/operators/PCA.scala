package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Top-principal-component extraction by power iteration over the
  * integer scatter matrix — the whitening/dimension-reduction stage
  * an embedding pipeline runs before ANN indexing (FAISS PCAMatrix,
  * OPQ's rotation seed), reduced to its repo-discipline core: every
  * number a long, every step replayable in SQL.
  *
  * Arithmetic: vectors quantize to milliunits; the centered scatter
  * matrix is S'_ij = Σ q_i q_j − sign·(|Σq_i · Σq_j| div n)
  * (integer truncation toward zero — the one documented deviation
  * from the rational n·Cov, bounded by 1 per entry); power
  * iteration keeps the direction in e4 fixed point, renormalizing
  * by max-component division (power iteration converges under any
  * positive rescale), signs handled as sign(x)·(|x| div d) so both
  * engines truncate toward zero identically; the final sign
  * convention flips the vector so its largest-magnitude component
  * (smallest index on ties) is positive. T is small and fixed —
  * convergence is geometric in the eigengap.
  *
  * Scale shape: the scatter fit is ONE corpus scan accumulating
  * dim + dim² longs per partition (a BLAS syrk, the genuine
  * per-partition-imperative case) collected as partition-count
  * rows; the iteration runs on the driver over the 64×64 matrix
  * (model-sized, like the KMeans/PQ/BPE fits); the projection is a
  * narrow 64-term codegen'd expression. Nothing shuffles, nothing
  * grows with the corpus.
  */
object PCA {

  /** Partition-accumulated moments: count, per-dim sums, row-major
    * scatter Σ q_i q_j. */
  final case class Moments(n: Long, sums: Seq[Long], scatter: Seq[Long])

  /** One-scan integer moments of the milliunit grid. */
  def moments(df: DataFrame, vecCol: String, dim: Int): Moments = {
    val spark = df.sparkSession
    import spark.implicits._
    val q: Dataset[Seq[Long]] =
      df.select(KMeans.quantize(col(vecCol))).as[Seq[Long]]
    val parts = q.mapPartitions { it =>
      val s = new Array[Long](dim)
      val sc = new Array[Long](dim * dim)
      var n = 0L
      it.foreach { v =>
        n += 1
        var i = 0
        while (i < dim) {
          val vi = v(i)
          s(i) += vi
          var j = 0
          while (j < dim) { sc(i * dim + j) += vi * v(j); j += 1 }
          i += 1
        }
      }
      Iterator((n, s.toSeq, sc.toSeq))
    }.collect()
    val s = new Array[Long](dim)
    val sc = new Array[Long](dim * dim)
    var n = 0L
    parts.foreach { case (pn, ps, psc) =>
      n += pn
      var i = 0
      while (i < dim) { s(i) += ps(i); i += 1 }
      var k = 0
      while (k < dim * dim) { sc(k) += psc(k); k += 1 }
    }
    Moments(n, s.toSeq, sc.toSeq)
  }

  /** Truncate-toward-zero long division, the arithmetic both Spark
    * and DuckDB replay identically when written sign(x)·(|x| div d). */
  private def tdiv(x: Long, d: Long): Long = {
    val q = math.abs(x) / d
    if (x < 0) -q else q
  }

  /** e4 fixed-point top principal direction after `iters` power
    * steps from the all-ones start. */
  def fitTop(df: DataFrame, vecCol: String, dim: Int,
             iters: Int = 4): Seq[Long] = {
    val m = moments(df, vecCol, dim)
    require(m.n > 0, "PCA.fitTop on an empty frame")
    // centered scatter: S' = scatter - (sums_i * sums_j) tdiv n
    val s = Array.tabulate(dim * dim) { k =>
      val (i, j) = (k / dim, k % dim)
      m.scatter(k) - tdiv(m.sums(i) * m.sums(j), m.n)
    }
    var v = Array.fill(dim)(10000L)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0L
        var j = 0
        while (j < dim) { acc += s(i * dim + j) * v(j); j += 1 }
        acc
      }
      val mx = w.map(math.abs).max
      val d = math.max(1L, mx / 10000L)
      v = w.map(tdiv(_, d))
    }
    // sign convention: the largest-|v_i)| component (smallest index on
    // ties) points positive
    val mi = v.indices.minBy(i => (-math.abs(v(i)), i))
    if (v(mi) < 0) v.map(-_).toSeq else v.toSeq
  }

  /** Integer projection of every vector onto the e4 direction: one
    * narrow projection of a 64-term sum, zero shuffles.
    * @return (idCol, proj) */
  def project(df: DataFrame, idCol: String, vecCol: String,
              direction: Seq[Long]): DataFrame = {
    val q = df.select(col(idCol), KMeans.quantize(col(vecCol)).as("__q"))
    val proj = direction.zipWithIndex.map { case (vi, i) =>
      element_at(col("__q"), i + 1) * lit(vi)
    }.reduce(_ + _)
    q.select(col(idCol), proj.as("proj"))
  }
}
