package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus layout operators: deterministic sharding and
  * sequence packing — the steps between "deduplicated documents" and
  * "token batches on disk" in an LLM data pipeline. Nothing like
  * this exists in the reference (it stops at a flat DataFrame); both
  * operators are shaped so the 100 TB form is the same code:
  *
  *  - sharding is a narrow map (portable md5 arithmetic, no skew:
  *    hash output is uniform by construction);
  *  - packing shuffles once on the shard key and then runs a
  *    partition-local sequential pass — the legitimate Spark shape
  *    for per-group sequential logic (sortWithinPartitions +
  *    mapPartitions, no driver involvement, no window over the
  *    whole corpus).
  */
object Packing {

  /** Deterministic shard id in [0, nShards) from md5 of the id
    * column — stable across engines, runs, and cluster sizes
    * (DuckDB replays it exactly; Spark's hash() would not match). */
  def shardId(idCol: String, nShards: Int) =
    expr(s"conv(substring(md5(cast($idCol AS STRING)), 1, 6), 16, 10) % $nShards")
      .cast("long")

  /** 48-bit md5 hash of a column — the portable Spark<->DuckDB
    * integer hash (oracle replay:
    * `CAST('0x' || substring(md5(x), 1, 12) AS BIGINT)`); width-12
    * twin of [[shardId]]'s width-6 bucket hash. Every new operator
    * needing an engine-portable hash should use this ONE audited
    * form rather than re-inlining the conv/substring idiom. */
  def hash48(c: String) =
    expr(s"conv(substring(md5(cast($c AS STRING)), 1, 12), 16, 10)")
      .cast("long")

  /** [[hash48]] over a Column — the form HOF lambdas need (a lambda
    * variable has no resolvable name for the expr() twin). */
  def hash48c(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Offset-binned packing: documents are laid out in deterministic
    * order (by `idCol`) within each shard; a document's pack is
    * `floor(cumulative_tokens_before / budget)` — i.e. fixed token
    * offsets cut the stream into packs. A pack can overflow by at
    * most one document (the straddler stays in the earlier pack),
    * which training pipelines accept for the benefit of a pure
    * window-function form: one shuffle on (shard), exact SQL oracle.
    */
  def offsetBinned(docs: DataFrame, idCol: String, tokCol: String,
                   nShards: Int, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
    docs
      .withColumn("shard", shardId(idCol, nShards))
      .withColumn("cum_before",
        coalesce(sum(col(tokCol)).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", floor(col("cum_before") / budget).cast("long"))
  }

  /** Exact greedy packing: within a shard, documents are taken in
    * `idCol` order and a new pack starts whenever adding the next
    * document would exceed `budget` (documents larger than the
    * budget get a pack of their own). No pack overflows (unless a
    * single document does). One shuffle (repartition by shard),
    * partition-local sort + sequential fold; output schema =
    * (shard, pack_id, id, n_tokens).
    */
  final case class PackDoc(shard: Long, id: Long, n_tokens: Long)
  final case class Packed(shard: Long, pack_id: Long, id: Long, n_tokens: Long)

  def greedyPack(docs: DataFrame, idCol: String, tokCol: String,
                 nShards: Int, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .withColumn("shard", shardId(idCol, nShards))
      .select(col("shard"), col(idCol).cast("long").as("id"),
        col(tokCol).cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard").asc, col("id").asc)
      .as[PackDoc]
    prepared.mapPartitions { it =>
      // rows arrive clustered by shard, sorted by id within it
      var curShard = Long.MinValue
      var packId = -1L
      var used = 0L
      it.map { d =>
        if (d.shard != curShard) { curShard = d.shard; packId = 0L; used = 0L }
        else if (used + d.n_tokens > budget) { packId += 1L; used = 0L }
        used += d.n_tokens
        Packed(d.shard, packId, d.id, d.n_tokens)
      }
    }.toDF()
  }

  /** Length-bucketing for padded-batch efficiency — the inference /
    * fine-tuning complement of [[greedyPack]]'s concat packing: when
    * sequences batch WITHOUT concatenation, every sequence pads to
    * its batch's max length, so batching similar lengths together is
    * the whole game. Buckets are the smallest boundary >= the token
    * count (ascending `boundaries`, clamped-and-truncated at the top
    * — the long-tail truncation regime); the report gives per-bucket
    * document count, the token sum (post-truncation) and the exact
    * e4 padding efficiency sum(min(len, bucket)) / (n · bucket) —
    * the number a batch scheduler tunes boundaries against.
    *
    * Scale shape: one narrow CASE projection + one map-combined
    * aggregation over <= |boundaries| groups. All-integer.
    * @return (bucket, n_docs, sum_tokens, pad_eff_e4) */
  def lengthBuckets(docs: DataFrame, tokCol: String,
                    boundaries: Seq[Long] = Seq(32L, 64L, 128L, 256L,
                      512L, 1024L, 2048L)): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted)
    val top = boundaries.last
    val n = col(tokCol).cast("long")
    val bucket = boundaries.init.reverse
      .foldLeft(lit(top): Column)((acc, b) => when(n <= b, lit(b)).otherwise(acc))
    // decimal-widened numerator: sum_tokens is a corpus-scale bucket
    // sum, and sum_tokens * 10000 in LONG wraps past ~9.2e14 tokens —
    // the exact regime the e4 fixed point exists for
    def idiv(a: Column, scale: Long, d: Column): Column =
      IntMath.scaledDivTrunc(a, scale, d)
    // drop null token counts explicitly: `when(n <= b)` is
    // null-false, so a null would silently fall through to the TOP
    // bucket, and least(null, top) returns top (Spark least skips
    // nulls) — a full top-bucket credit for an invalid row
    docs.filter(n.isNotNull)
      .select(bucket.as("bucket"), least(n, lit(top)).as("__t"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("sum_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        idiv(col("sum_tokens"), 10000L, col("n_docs") * col("bucket"))
          .as("pad_eff_e4"))
  }
}
