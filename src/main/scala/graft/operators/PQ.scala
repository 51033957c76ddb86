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
    * slices. `dim` must be divisible by `m`.
    *
    * Seeding is ONE TakeOrdered scan: the k smallest ids' full
    * quantized vectors collect once and every subspace slices its
    * init centroids driver-side — identical codebooks to seeding
    * each subspace with its own scan (the slice of a row is the row
    * of a slice), minus m-1 corpus scans. */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
          m: Int = 4, k: Int = 16, steps: Int = 2): Codebooks = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val q = df.select(col(idCol), KMeans.quantize(col(vecCol)).as("__qf"))
    val seeds: Array[Seq[Long]] =
      q.orderBy(col(idCol).asc).limit(k).collect()
        .map(_.getSeq[Long](1).toSeq)
    val all = (0 until m).flatMap { j =>
      val qj = q.select(col(idCol),
        slice(col("__qf"), j * subDim + 1, subDim).as("__q"))
      val init: Map[Int, Seq[Long]] =
        seeds.map(_.slice(j * subDim, (j + 1) * subDim)).zipWithIndex
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
             books: Codebooks, keep: Seq[String] = Nil): DataFrame = {
    import graft.plans.VectorExpressions.dotLong
    val q = df.select(col(idCol) +: keep.map(col) :+
      KMeans.quantize(col(vecCol)).as("__qf"): _*)
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
    coded.select(col(idCol) +: keep.map(col) ++:
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
  /** Per-query lookup table (m*k exact integer distances), resolved
    * per row as an element_at over a literal MAP keyed by the
    * (possibly sparse — see encode) original cluster-id codes: O(1)
    * per subspace and constant codegen size, where a when-chain would
    * be k comparisons per subspace and blow up generated-method size
    * at production k=256. */
  private def adcDistExpr(books: Codebooks, query: Seq[Double]): Column = {
    val qq: Seq[Long] = query.map(x => math.floor(x * 1000).toLong)
    val lut: Map[(Int, Int), Long] = books.centroids.map { case ((j, c), cent) =>
      val qs = qq.slice(j * books.subDim, (j + 1) * books.subDim)
      (j, c) -> qs.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    (0 until books.m).map { j =>
      val table: Map[Int, Long] =
        subspaceCodes(books, j).map(c => c -> lut((j, c))).toMap
      element_at(typedlit(table), col(s"code_$j"))
    }.reduce(_ + _)
  }

  def adcTopK(codes: DataFrame, idCol: String, books: Codebooks,
              query: Seq[Double], n: Int = 10): DataFrame = {
    val dist = adcDistExpr(books, query)
    // orderBy+limit plans as TakeOrderedAndProject: every task keeps
    // only its n best rows, the driver merges — no global sort
    codes.withColumn("adc_dist", dist)
      .orderBy(col("adc_dist").asc, col(idCol).asc).limit(n)
      .select(col(idCol), col("adc_dist"))
  }

  /** IVF+PQ — the composed billion-vector recipe (FAISS IVFPQ, Jégou
    * et al. 2011 §V): corpus vectors are assigned to inverted-file
    * cells AND compressed to PQ codes; a query probes its `nProbe`
    * nearest cells and ADC-scores only those cells' residents through
    * the m*k lookup table.
    *
    * Plan shape: cell assignment + encode are ONE narrow projection
    * over the corpus (broadcast centroid matrix + codebook literals —
    * zero exchanges); the probe is a partition-pruning filter
    * (`cell IN (...)`, a literal list); scoring is a when-chain over
    * byte codes; the only exchange is the final TakeOrdered merge. At
    * 100 TB, write the code table bucketed by cell and the probe
    * filter becomes partition pruning on disk — the query never
    * touches 1/nlist of the corpus, compressed 32x.
    *
    * Deterministic centroids make even the composed path
    * oracle-checkable: assignment/probing use round-to-6 cosine with
    * a centroid-id tiebreak (same discipline as [[Similarity.ivfTopK]]).
    */
  def ivfpqTopK(corpus: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, cidCol: String, books: Codebooks,
                query: Seq[Double], nProbe: Int = 4, n: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    val cents = Similarity.collectCentroids(centroids, cidCol, vecCol)
    val bc = spark.sparkContext.broadcast(cents)
    val assignU = org.apache.spark.sql.functions.udf {
      (v: Seq[Float]) => Similarity.nearestCell(v, bc.value) }
    val probed = Similarity.probeCells(query.map(_.toFloat), cents, nProbe)

    val withCell = corpus.withColumn("__cell", assignU(col(vecCol)))
    val codes = encode(withCell, idCol, vecCol, books, keep = Seq("__cell"))
      .filter(col("__cell").isin(probed: _*))

    codes.withColumn("adc_dist", adcDistExpr(books, query))
      .orderBy(col("adc_dist").asc, col(idCol).asc).limit(n)
      .select(col(idCol), col("adc_dist"), col("__cell").as("cell"))
  }
}
