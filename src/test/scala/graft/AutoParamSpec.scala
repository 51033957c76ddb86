package graft

import graft.operators.{KMeans, Similarity}

/** The parameter-scaling discipline as CODE (autoPlanes / autoK):
  * the formulas pinned at the corpus sizes SCALE.md discusses, and
  * the nPlanes = 0 / k = 0 auto paths pinned against the
  * frozen-parameter operators where they must coincide or bound
  * them. This is the round-5 scale-probe finding (frozen LSH/k-means
  * parameters going superlinear) converted into retired risk.
  */
class AutoParamSpec extends SparkSpec {

  test("autoPlanes = clamp(ceil(log2(n/B)), 1, 40)") {
    assert(Similarity.autoPlanes(500) == 3)
    assert(Similarity.autoPlanes(50000) == 10)
    assert(Similarity.autoPlanes(1000000000L) == 24)
    assert(Similarity.autoPlanes(10) == 1) // floor clamp
    assert(Similarity.autoPlanes(Long.MaxValue) == 40) // ceiling clamp
    assert(Similarity.autoPlanes(6400, targetBucket = 100) == 6)
  }

  test("autoK = clamp(ceil(n/B), 2, maxK)") {
    assert(KMeans.autoK(500) == 8)
    assert(KMeans.autoK(50000) == 782)
    assert(KMeans.autoK(5000000) == 78125)
    assert(KMeans.autoK(10) == 2) // floor clamp
    assert(KMeans.autoK(Long.MaxValue) == (1 << 20)) // driver-budget clamp
    assert(KMeans.autoK(50000, targetCluster = 1000) == 50)
  }

  test("semantic auto twin reproduces the frozen oracled query at sf0.01") {
    // 500 embeddings at sf0.01 -> autoK(500) = 8 = the frozen oracle
    // k, so k = 0 must give the EXACT oracled result there
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairs(k: Int): Set[(Long, Long, Int)] =
      KMeans.semanticNearDupPairs(emb, "vec_id", "embedding",
          k = k, steps = 2, minCosE4 = 4200L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs(0) == pairs(8))
  }

  test("lsh auto twin keeps precision 1 and high recall on planted near-dups") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val bases = (0 until 30).map(i => (i.toLong, vec()))
    val noisy = bases.map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val df = (bases ++ noisy).toDF("vec_id", "embedding")
    val exact = Similarity.embeddingNearDupPairs(df, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nPlanes = 0 -> autoPlanes(60) = 1: coarse buckets at tiny n —
    // the auto path adapts DOWN as well as up
    val auto = Similarity.embeddingNearDupPairsLSH(
        df, "vec_id", "embedding", 0.9, dim = 64, nPlanes = 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exact)) // exact verification: precision 1
    assert(auto.size.toDouble / exact.size >= 0.8,
      s"recall ${auto.size}/${exact.size} too low under auto planes")
  }
}
