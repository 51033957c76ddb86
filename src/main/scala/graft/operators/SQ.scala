package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding columns — the lighter
  * sibling of [[PQ]] that production vector stores (FAISS
  * `ScalarQuantizer`, Lucene/Elasticsearch int8 HNSW) default to
  * before reaching for product codes: per-dimension affine mapping
  * of floats onto 0..255, a 4x shrink at float32 with ~1% recall
  * loss, and distance evaluation directly on the reconstructed
  * grid points.
  *
  * Discipline matches the KMeans/PQ family so the whole fit →
  * encode → ADC search replays bit-identically in SQL:
  * vectors quantize to integer milliunits first
  * ([[KMeans.quantize]]), the per-dimension [lo, hi] bounds are
  * exact integer min/max, codes are integer floor-division
  * arithmetic, and reconstruction is the integer midpoint
  * `lo + ((2c+1)(hi-lo)) div 510` — every value a long, every
  * comparison exact.
  *
  * Scale shape: [[fit]] is ONE map-combined aggregation producing
  * 2*dim longs on the driver (the bounds — bytes, not data).
  * [[encode]] and [[adcTopK]]'s reconstruction are narrow
  * projections of 64 codegen'd scalar expressions against literal
  * bounds — no join, no shuffle, nothing grows with the corpus.
  * The ADC dot product is the native long-array kernel
  * (graft.plans.DotProductLong) inside whole-stage codegen; top-k
  * is the bounded [[TopK]] partial aggregate. At 100 TB the encode
  * adds zero exchanges to the scan, exactly like PQ's.
  */
object SQ {

  /** Per-dimension inclusive milliunit bounds. */
  final case class Bounds(lo: Seq[Long], hi: Seq[Long]) {
    def dim: Int = lo.length
  }

  private val LEVELS = 255L // codes 0..255 -> 510 half-steps

  /** One-scan fit: per-dimension min/max of the milliunit grid.
    * 2*dim aggregate expressions, map-side combined — the shuffle
    * carries 2*dim longs per partition regardless of corpus size. */
  def fit(df: DataFrame, vecCol: String, dim: Int): Bounds = {
    val q = df.select(KMeans.quantize(col(vecCol)).as("__q"))
    val aggs = (1 to dim).map(i => min(element_at(col("__q"), i)).as(s"lo$i")) ++
      (1 to dim).map(i => max(element_at(col("__q"), i)).as(s"hi$i"))
    val row = q.agg(aggs.head, aggs.tail: _*).collect()(0)
    Bounds((0 until dim).map(row.getLong), (dim until 2 * dim).map(row.getLong))
  }

  /** Integer floor-division code for one milliunit value against
    * literal [lo, hi]: clamp(((v - lo) * 255) div (hi - lo), 0, 255).
    * A constant dimension (hi == lo) codes to 0. Products stay under
    * ~2^30 at embedding magnitudes, exact in the double floor. */
  private def codeExpr(v: Column, lo: Long, hi: Long): Column =
    if (hi == lo) lit(0L)
    else least(lit(LEVELS), greatest(lit(0L),
      floor(((v - lit(lo)) * lit(LEVELS)).cast("double") / lit(hi - lo))
        .cast("long")))

  /** Integer midpoint reconstruction of a code back onto the
    * milliunit grid: lo + ((2c + 1) * (hi - lo)) div 510. */
  private def reconExpr(c: Column, lo: Long, hi: Long): Column =
    if (hi == lo) lit(lo)
    else lit(lo) + floor(((c * lit(2L) + lit(1L)) * lit(hi - lo)).cast("double")
      / lit(2L * LEVELS)).cast("long")

  /** Encode every vector as its dim int8 codes — one narrow
    * projection, dim codegen'd scalar expressions vs literal
    * bounds. Output: (idCol, keep..., codes array<long>). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             bounds: Bounds, keep: Seq[String] = Nil): DataFrame = {
    val q = df.select(
      (col(idCol) +: keep.map(col) :+ KMeans.quantize(col(vecCol)).as("__q")): _*)
    val codes = array((0 until bounds.dim).map { i =>
      codeExpr(element_at(col("__q"), i + 1), bounds.lo(i), bounds.hi(i))
    }: _*)
    q.select((col(idCol) +: keep.map(col) :+ codes.as("codes")): _*)
  }

  /** Reconstructed milliunit vectors from a coded frame — the
    * decode half of ADC, again dim scalar expressions. */
  def reconstruct(coded: DataFrame, bounds: Bounds): DataFrame =
    coded.withColumn("__r", array((0 until bounds.dim).map { i =>
      reconExpr(element_at(col("codes"), i + 1), bounds.lo(i), bounds.hi(i))
    }: _*))

  /** Exact-arithmetic ADC top-k: score every (query, code) pair by
    * the integer dot product of the query's milliunit vector with
    * the reconstructed corpus vector, rank desc / id asc. Queries
    * broadcast (thousands, not millions); the corpus side is the
    * coded frame — the raw vectors are never touched, which is the
    * point of quantized search. Score is a plain long: no float
    * boundary anywhere, so ranks replay exactly in SQL.
    * @return (query_id, neighbor_id, rank, score) */
  def adcTopK(queries: DataFrame, coded: DataFrame,
              qidCol: String, idCol: String, vecCol: String,
              bounds: Bounds, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(qidCol).as("query_id"),
      KMeans.quantize(col(vecCol)).as("__qv")))
    val r = reconstruct(coded, bounds)
      .select(col(idCol).as("neighbor_id"), col("__r"))
    val scored = q.join(r, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.plans.VectorExpressions.dotLong(col("__qv"), col("__r"))
          .as("score"))
    TopK.perKey(scored, "query_id", "neighbor_id", "score", k)
  }
}
