package graft

import org.apache.spark.sql.functions._

/** Sinks + scan-side pruning: the write paths the reference lacks
  * entirely (its only output is an in-memory DataFrame) and the two
  * scan properties that matter most at 100 TB — partition pruning
  * and predicate pushdown — asserted at the physical-plan level.
  */
class SinkSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val scratch = "target/scratch"

  test("partitioned parquet sink prunes partitions at read time") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dir = s"$scratch/orders_by_status"
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)

    val back = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    assert(back.count() == orders.filter(col("o_orderstatus") === "F").count())
    // the filter lands in the scan's PartitionFilters (directory-level
    // pruning), not as a row-level data filter
    val scan = back.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.toString
    assert(meta.contains("PartitionFilters: [isnotnull(o_orderstatus"), meta)
    assert(meta.contains("= F)"), meta)
    // and after execution the scan reports reading exactly one file
    // (one status directory), not all three
    back.collect()
    val numFiles = scan.metrics.get("numFiles").map(_.value)
    assert(numFiles.contains(1L), s"numFiles=$numFiles")
  }

  test("predicate and projection reach the parquet scan") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") === 42L)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = li.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)"),
      plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      plan)
  }

  test("writePlan: zero-byte and all-null payload groups still plan one file") {
    import spark.implicits._
    val df = Seq(
      ("g_empty", ""), ("g_empty", ""),
      ("g_real", "x" * 5000), ("g_real", "y" * 100)
    ).toDF("src", "payload")
      .unionByName(Seq(("g_null", 1)).toDF("src", "ignore")
        .select(col("src"), lit(null).cast("string").as("payload")))
    val plan = graft.operators.Layout.writePlan(df, "src", "payload",
      targetBytes = 2048L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
    // the r13 ADVICE degeneracy: ceil division alone planned 0 files
    // for a 0-byte group and rows_per_file divided by zero
    assert(plan("g_empty") == ((2L, 0L, 1L, 2L)), plan("g_empty"))
    assert(plan("g_real") == ((2L, 5100L, 3L, 1L)), plan("g_real"))
    // all-null payload: est_bytes is NULL (sum over nulls), n_files
    // clamps to 1, rows_per_file stays defined
    assert(plan("g_null") == ((1L, -1L, 1L, 1L)), plan("g_null"))
  }

  test("Layout.sized controls output file count; cap bounds file rows") {
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$sf/lineitem.parquet") // 6000 rows
    graft.operators.Layout.sized(li, rowsPerFile = 1500,
        clusterBy = Seq("l_orderkey"))
      .write.mode("overwrite").parquet(s"$scratch/li_sized")
    val files = new java.io.File(s"$scratch/li_sized")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(files == 4, s"expected 4 sized files, got $files")
    // range clustering -> disjoint key ranges across files (tight
    // min/max stats); verify via per-file key ranges
    val ranges = spark.read.parquet(s"$scratch/li_sized")
      .select(org.apache.spark.sql.functions
        .input_file_name().as("f"), col("l_orderkey"))
      .groupBy("f")
      .agg(org.apache.spark.sql.functions.min("l_orderkey").as("lo"),
        org.apache.spark.sql.functions.max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // strict: equal keys always land in ONE range partition, so
    // adjacent files must not even share a boundary key
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, ranges.toSeq)
      case _ =>
    }
    // the hard cap splits an oversized partition at write time
    graft.operators.Layout.cappedWriter(li.repartition(1), 1000)
      .mode("overwrite").parquet(s"$scratch/li_capped")
    val capped = new java.io.File(s"$scratch/li_capped")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(capped == 6, s"expected 6 capped files, got $capped")
  }

  test("round trip through json and orc sinks preserves rows") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    nation.write.mode("overwrite").json(s"$scratch/nation_json")
    nation.write.mode("overwrite").orc(s"$scratch/nation_orc")
    val viaJson = spark.read.json(s"$scratch/nation_json")
    val viaOrc = spark.read.orc(s"$scratch/nation_orc")
    assert(viaJson.count() == nation.count())
    assert(viaOrc.count() == nation.count())
    // orc keeps the exact schema; json widens but keeps all columns
    assert(viaOrc.schema == nation.schema)
    assert(viaJson.columns.sorted.sameElements(nation.columns.sorted))
  }
}
