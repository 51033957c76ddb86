package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing
import graft.functions.TextFunctions.bpeishTokenCount

/** Greedy packing invariants (the exact variant has no SQL oracle —
  * its semantics are sequential-per-shard) plus agreement between
  * the two packing forms on their shared structure.
  */
class PackingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val budget = 512L

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), bpeishTokenCount(col("text")).cast("long").as("n_tok"))

  test("greedyPack: no pack overflows unless a single doc does") {
    val packed = Packing.greedyPack(docs, "doc_id", "n_tok", nShards = 4, budget)
    val packs = packed.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"),
        max("n_tokens").as("max1"))
      .collect()
    assert(packs.nonEmpty)
    packs.foreach { r =>
      val tok = r.getLong(2); val n = r.getLong(3); val max1 = r.getLong(4)
      assert(tok <= budget || (n == 1L && max1 > budget),
        s"pack ${r.getLong(0)}/${r.getLong(1)} overflows: $tok tokens in $n docs")
    }
  }

  test("greedyPack: every doc appears exactly once, ids ordered within packs") {
    val packed = Packing.greedyPack(docs, "doc_id", "n_tok", nShards = 4, budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.map(_._3).sorted.sameElements(
      docs.collect().map(_.getLong(0)).sorted))
    // within a shard, pack ids are nondecreasing as doc ids grow
    packed.groupBy(_._1).values.foreach { rs =>
      val byId = rs.sortBy(_._3)
      assert(byId.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("greedy packs are never sparser than offset bins") {
    // offset binning cuts at fixed token offsets, so it produces the
    // minimum number of bins for the same order; greedy can only add
    // boundaries (a straddler starts a new pack instead of splitting)
    val greedy = Packing.greedyPack(docs, "doc_id", "n_tok", 4, budget)
      .groupBy("shard").agg(countDistinct("pack_id").as("n_packs")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = Packing.offsetBinned(docs, "doc_id", "n_tok", 4, budget)
      .groupBy("shard").agg(countDistinct("pack_id").as("n_packs")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(greedy.keySet == binned.keySet)
    greedy.foreach { case (shard, n) => assert(n >= binned(shard)) }
  }
}
