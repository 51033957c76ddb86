package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located joins: same-key/same-count bucketed tables
  * sort-merge-join without a shuffle — verified at the plan level.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans without shuffle exchanges") {
    // clean slate: drop tables and any leftover warehouse locations
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }

    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(ord, "ord_bucketed", "l_orderkey", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("hashpartitioning"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 6000) // every lineitem matches its order

      // the same join on raw (unbucketed) frames does shuffle,
      // proving the assertion above is meaningful
      val rawPlan = li.join(ord, "l_orderkey")
        .queryExecution.executedPlan.toString
      assert(rawPlan.contains("hashpartitioning"), rawPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
