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
}
