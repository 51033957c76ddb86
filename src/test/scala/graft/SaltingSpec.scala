package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting

/** Skew-mitigation joins must be invisible semantically: both the
  * full-replication demo form and the two-tier hot-key form equal
  * the plain inner equi-join row for row.
  */
class SaltingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
  private def ord = spark.read.parquet(s"$sf/orders.parquet")
    .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select("l_orderkey", "l_linenumber", "o_custkey")
      .collect().map(_.toSeq).toSet

  test("saltedJoin equals the plain inner join") {
    val plain = canon(li.join(ord, Seq("l_orderkey")))
    assert(canon(Salting.saltedJoin(li, ord, "l_orderkey", buckets = 8)) == plain)
    assert(plain.nonEmpty)
  }

  test("hotKeySaltedJoin equals the plain join with detected hot keys") {
    val hot = li.groupBy("l_orderkey").count()
      .orderBy(col("count").desc, col("l_orderkey").asc)
      .limit(3).collect().map(_.getLong(0)).toSeq
    val plain = canon(li.join(ord, Seq("l_orderkey")))
    val tiered = Salting.hotKeySaltedJoin(li, ord, "l_orderkey", hot, buckets = 4)
    assert(canon(tiered) == plain)
    // and with no hot keys at all it degrades to exactly the plain path
    val none = Salting.hotKeySaltedJoin(li, ord, "l_orderkey", Seq(-1L), buckets = 4)
    assert(canon(none) == plain)
  }

  test("detectHotKeys finds a dominating key from a sample and skips uniform data") {
    import spark.implicits._
    // power-law fixture: key 7 carries half the rows
    val skewed = (Seq.fill(5000)(7L) ++ (0L until 5000L).map(_ % 500))
      .toDF("k")
    val hot = Salting.detectHotKeys(skewed, "k", fraction = 0.2,
      hotShare = 0.1)
    assert(hot == Seq(7L))
    // uniform data: nothing crosses the share threshold
    val uniform = (0L until 10000L).map(_ % 1000).toDF("k")
    assert(Salting.detectHotKeys(uniform, "k", fraction = 0.2,
      hotShare = 0.1).isEmpty)
  }

  test("autoSaltedJoin (sampled detection) equals the declared-hot-key join") {
    import spark.implicits._
    val skewed = (Seq.fill(5000)(7L) ++ (0L until 5000L).map(_ % 500))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
    val dim = (0L until 1000L).map(k => (k, s"dim$k")).toDF("k", "label")
    def canon2(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
      df.select("k", "row_id", "label").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val declared = canon2(
      Salting.hotKeySaltedJoin(skewed, dim, "k", Seq(7L), buckets = 4))
    val auto = canon2(
      Salting.autoSaltedJoin(skewed, dim, "k", buckets = 4,
        fraction = 0.2, hotShare = 0.1))
    assert(auto == declared)
    assert(auto == canon2(skewed.join(dim, Seq("k"))))
    assert(auto.nonEmpty)
  }
}
