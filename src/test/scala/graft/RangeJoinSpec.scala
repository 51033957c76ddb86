package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** The bucketed range join must equal the naive theta-join on the
  * same predicate, including boundary (half-open) semantics, and its
  * physical plan must be an equi-join, not a nested loop.
  */
class RangeJoinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("pointInInterval equals naive BETWEEN join, half-open bounds") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val iv = orders.filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_orderdate").as("s"),
        (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("e"))
    val pts = li.select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))

    val bucketed = RangeJoin.pointInInterval(pts, iv, "l_shipdate", "s", "e")
      .select("o_orderkey", "l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toSet
    val naive = pts.join(iv,
        col("l_shipdate") >= col("s") && col("l_shipdate") < col("e"))
      .select("o_orderkey", "l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }

  test("plan is an equi-join on the bucket, no BroadcastNestedLoopJoin") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val iv = orders.select(col("o_orderkey"), col("o_orderdate").as("s"),
      (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("e"))
    val plan = RangeJoin.pointInInterval(
        li.select(col("l_shipdate")), iv, "l_shipdate", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("intervalOverlap equals the naive overlap theta-join, each pair once") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    def iv(mod: Int, days: Int, ida: String) = orders
      .filter(col("o_orderkey") % mod === 0)
      .select(col("o_orderkey").as(ida), col("o_orderdate").as(s"s_$ida"),
        (col("o_orderdate") + expr(s"INTERVAL $days DAY")).as(s"e_$ida"))
    val a = iv(97, 7, "ia")
    val b = iv(89, 5, "ib")
    val bucketed = RangeJoin.intervalOverlap(a, b, "s_ia", "e_ia", "s_ib", "e_ib")
      .select("ia", "ib").collect().map(_.toSeq)
    val naive = a.join(b,
        col("s_ia") < col("e_ib") && col("s_ib") < col("e_ia"))
      .select("ia", "ib").collect().map(_.toSeq)
    // set equality AND multiset equality: a pair sharing several
    // buckets must not emit twice
    assert(bucketed.toSet == naive.toSet)
    assert(bucketed.length == naive.length, "first-shared-bucket dedup failed")
    assert(bucketed.nonEmpty)
  }

  test("intervalOverlap half-open: touching intervals do not match") {
    import spark.implicits._
    val a = Seq((1L, "2024-01-01", "2024-01-05")).toDF("ia", "s1", "e1")
      .select(col("ia"), col("s1").cast("date"), col("e1").cast("date"))
    val b = Seq((2L, "2024-01-05", "2024-01-09"),   // touches e1 exactly
                (3L, "2024-01-04", "2024-01-06"),   // overlaps 1 day
                (4L, "2023-12-20", "2024-01-30"))   // contains a entirely
      .toDF("ib", "s2", "e2")
      .select(col("ib"), col("s2").cast("date"), col("e2").cast("date"))
    val got = RangeJoin.intervalOverlap(a, b, "s1", "e1", "s2", "e2")
      .select("ib").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(3L, 4L), s"half-open/containment broke: $got")
  }
}
