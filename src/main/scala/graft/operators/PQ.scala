package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the compression half of
  * the IVF+PQ recipe that every billion-vector ANN deployment runs:
  * split each vector into `m` subvectors, k-means each subspace
  * independently, and store a vector as its `m` centroid codes
  * (m bytes for k<=256 instead of 4*dim — a 32x shrink at dim=64,
  * m=8). Distances are then computed code-to-codebook (ADC), never
  * touching the raw vectors.
  *
  * Built on [[KMeans]]'s quantized-integer discipline, so the whole
  * fit+encode is a pure function of the data that replays
  * bit-identically in SQL: milliunit quantization, init = k smallest
  * ids' subvectors, exact integer distances, ties to the smaller
  * code.
  *
  * Scale shape: each subspace fit is the KMeans loop (narrow
  * assignment against broadcast centroid literals + one k*subDim
  * aggregation per step); the final encode is ONE narrow projection
  * over the corpus — all m argmins evaluate per-row against m*k
  * broadcast literals, no join, no shuffle. The driver only ever
  * holds m*k*subDim longs (the codebooks). At 100 TB the encode adds
  * zero exchanges to the scan.
  */
object PQ {

  /** Per-subspace codebooks: (subspace, code) -> centroid, in
    * milliunit longs. */
  final case class Codebooks(m: Int, subDim: Int,
                             centroids: Map[(Int, Int), Seq[Long]])

  /** Fit m independent codebooks over the quantized subvector
    * slices. `dim` must be divisible by `m`. */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
          m: Int = 4, k: Int = 16, steps: Int = 2): Codebooks = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val q = df.select(col(idCol), KMeans.quantize(col(vecCol)).as("__qf"))
    val all = (0 until m).flatMap { j =>
      val qj = q.select(col(idCol),
        slice(col("__qf"), j * subDim + 1, subDim).as("__q"))
      val init: Map[Int, Seq[Long]] =
        qj.orderBy(col(idCol).asc).limit(k).collect()
          .map(_.getSeq[Long](1).toSeq).zipWithIndex
          .map { case (v, i) => i -> v }.toMap
      var centroids = init
      for (_ <- 2 to steps) {
        centroids = KMeans.update(KMeans.assignTo(qj, centroids))
      }
      centroids.map { case (c, v) => (j, c) -> v }
    }
    Codebooks(m, subDim, all.toMap)
  }

  /** Encode every vector as its m nearest-centroid codes plus the
    * total squared quantization error — one narrow projection, codes
    * argmin'd against broadcast codebook literals. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             books: Codebooks): DataFrame = {
    import graft.plans.VectorExpressions.dotLong
    val q = df.select(col(idCol), KMeans.quantize(col(vecCol)).as("__qf"))
    val withSub = (0 until books.m).foldLeft(q) { (acc, j) =>
      acc.withColumn(s"__s$j",
        slice(col("__qf"), j * books.subDim + 1, books.subDim))
    }
    val coded = (0 until books.m).foldLeft(withSub) { (acc, j) =>
      // surviving cluster ids, sorted: an init centroid that captured
      // zero points in the last update pass has no codebook entry
      // (same convention as KMeans.assignTo), so codes are the
      // ORIGINAL cluster ids, not dense positions
      val ids = subspaceCodes(books, j)
      val sv = col(s"__s$j")
      val dists = array(ids.map { c =>
        val cent = books.centroids((j, c))
        dotLong(sv, sv) - lit(2L) * dotLong(sv, typedlit(cent)) +
          lit(cent.map(x => x * x).sum)
      }: _*)
      acc.withColumn(s"__d$j", dists)
        .withColumn(s"code_$j",
          element_at(typedlit(ids),
            array_position(col(s"__d$j"), array_min(col(s"__d$j"))).cast("int")))
        .withColumn(s"__e$j", array_min(col(s"__d$j")))
    }
    coded.select(col(idCol) +:
      (0 until books.m).map(j => col(s"code_$j")) :+
      (0 until books.m).map(j => col(s"__e$j")).reduce(_ + _).as("pq_err"): _*)
  }

  /** Surviving cluster ids of subspace j, sorted. */
  private def subspaceCodes(books: Codebooks, j: Int): Seq[Int] =
    books.centroids.keys.collect { case (`j`, c) => c }.toSeq.sorted

  /** Asymmetric-distance (ADC) top-`n` search: squared L2 between a
    * raw query and each ENCODED vector, computed as the sum of the
    * query's per-subspace distances to the assigned centroids. The
    * per-query lookup table (m*k longs) folds into broadcast
    * literals, so the search is a narrow projection over the code
    * table + a bounded [[TopK]] aggregate — the plan never touches
    * the original vectors, which is the entire point of PQ at scale.
    */
  def adcTopK(codes: DataFrame, idCol: String, books: Codebooks,
              query: Seq[Double], n: Int = 10): DataFrame = {
    val qq: Seq[Long] = query.map(x => math.floor(x * 1000).toLong)
    val lut: Map[(Int, Int), Long] = books.centroids.map { case ((j, c), cent) =>
      val qs = qq.slice(j * books.subDim, (j + 1) * books.subDim)
      (j, c) -> qs.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    // codes are original (possibly sparse) cluster ids — resolve each
    // through a literal when-chain, not positional element_at
    val dist = (0 until books.m).map { j =>
      subspaceCodes(books, j).map { c =>
        when(col(s"code_$j") === c, lit(lut((j, c))))
      }.reduceRight(_ otherwise _)
    }.reduce(_ + _)
    // orderBy+limit plans as TakeOrderedAndProject: every task keeps
    // only its n best rows, the driver merges — no global sort
    codes.withColumn("adc_dist", dist)
      .orderBy(col("adc_dist").asc, col(idCol).asc).limit(n)
      .select(col(idCol), col("adc_dist"))
  }
}
