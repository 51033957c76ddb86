package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Sampling + sketch-aggregate behavior (the operators whose output
  * is approximate or seeded, so their guarantees are pinned here
  * rather than by a SQL oracle).
  */
class SamplingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("seeded bernoulli sample is reproducible and near the fraction") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val a = Sampling.bernoulli(li, 0.2, seed = 7L).count()
    val b = Sampling.bernoulli(li, 0.2, seed = 7L).count()
    assert(a == b)
    assert(math.abs(a - 1200.0) < 200, s"got $a of 6000 at fraction 0.2")
  }

  test("stratified sample respects per-stratum fractions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sampled = Sampling.stratified(docs, "lang",
      Map("en" -> 0.5, "de" -> 1.0), seed = 7L)
    val by = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // absent keys dropped entirely
    assert(by.keySet == Set("en", "de"))
    assert(by("de") == full("de"))
    assert(by("en") <= full("en"))
    assert(math.abs(by("en") - 0.5 * full("en")) < 0.25 * full("en"))
  }

  test("hash sample is stable across row order and keeps ~k/b") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = Sampling.hashSample(docs, "doc_id", 3, 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val shuffled = Sampling.hashSample(docs.orderBy(rand(99)), "doc_id", 3, 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == shuffled)
    val n = docs.count().toDouble
    assert(math.abs(ids.size - n * 3 / 16) < n * 0.1)
  }

  test("temperature sampling: tail classes pass through, head classes thin to k/sqrt(N)") {
    import spark.implicits._
    // head class A: 400 rows; tail class B: 16 rows; k=4 ->
    // rate_A = 4/20 = 0.2, rate_B = 4/4 = 1.0 (all kept)
    val docs = ((1L to 400L).map(i => (i, "A")) ++
      (1001L to 1016L).map(i => (i, "B"))).toDF("id", "cls")
    val kept = graft.operators.Sampling.temperatureSample(docs, "id", "cls", k = 4.0)
      .select("id", "cls").as[(Long, String)].collect()
    val byCls = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCls("B") == (1001L to 1016L).toSet) // rate 1.0: every row
    // class A: exactly the ids whose 48-bit md5 shard is under 200000
    // ppm — recomputed independently here
    val expectA = (1L to 400L).filter { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(6).map("%02x".format(_)).mkString, 16)
      h % 1000000 < 200000
    }.toSet
    assert(byCls("A") == expectA)
    // and the thinning is in the right ballpark (~80 of 400)
    assert(expectA.size > 50 && expectA.size < 120)
  }

  test("approx_count_distinct stays within its error bound") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val rows = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }
}
