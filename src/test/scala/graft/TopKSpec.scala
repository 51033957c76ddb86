package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopK.perKey must be bit-identical to the rank-window form it
  * replaces (same deterministic order: rounded score desc, id asc). */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("key"))
      .orderBy(round(col("score"), 6).desc, col("id").asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("key"), col("id"), round(col("score"), 4).as("score"), col("rank"))
  }

  test("equivalent to rank window, including 6dp ties broken by id") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      // coarse rounding forces plenty of exact ties at 6 dp
      (rng.nextInt(5).toLong, i.toLong, math.round(rng.nextDouble() * 50) / 50.0)
    }
    val df = rows.toDF("key", "id", "score").repartition(8)
    val got = TopK.perKey(df, "key", "id", "score", 10)
      .orderBy("key", "rank").collect().toSeq
    val want = windowForm(df, 10).orderBy("key", "rank").collect().toSeq
    assert(got == want)
  }

  test("keys with fewer than k rows keep all rows") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 20L, 0.1))
      .toDF("key", "id", "score")
    val got = TopK.perKey(df, "key", "id", "score", 5)
      .orderBy("key", "rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 11L, 0.9, 1L), (1L, 10L, 0.5, 2L), (2L, 20L, 0.1, 1L)))
  }

  test("NaN scores rank first (Spark double order) and merge across partitions") {
    val df = Seq((1L, 1L, Double.NaN), (1L, 2L, 100.0), (1L, 3L, Double.NaN))
      .toDF("key", "id", "score").repartition(3)
    val got = TopK.perKey(df, "key", "id", "score", 2).orderBy("rank")
      .select("id", "rank").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (3L, 2L)))
  }

  test("plan shows partial aggregation before the exchange") {
    val df = (1 to 100).map(i => (i.toLong % 3, i.toLong, i * 0.5))
      .toDF("key", "id", "score").repartition(4)
    val plan = TopK.perKey(df, "key", "id", "score", 3)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs twice: partial map-side, final after
    // the shuffle — the property that bounds the exchange to k per key
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
