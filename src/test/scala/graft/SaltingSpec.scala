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
}
