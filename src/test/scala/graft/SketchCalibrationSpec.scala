package graft

import org.apache.spark.sql.functions._

/** Planted-corpus checks for the sketch calibration curve
  * (dedup_sketch_calibration): exact duplicates must land in the top
  * bucket with a perfect hit rate; unrelated docs must never reach
  * it; every output row respects the e4 invariants.
  */
class SketchCalibrationSpec extends SparkSpec {

  private def curve(docs: org.apache.spark.sql.DataFrame) = {
    import graft.operators.Dedup
    val cand = Dedup.minhashPairs(docs, "doc_id", "text",
      numHashes = 12, bands = 4, minEstimate = 0.0)
    val ex = Dedup.exactJaccardFor(cand.select(col("id_a"), col("id_b")),
      docs, "doc_id", "text", shingleLen = 3)
    cand.join(ex, Seq("id_a", "id_b"))
      .select(least(floor(col("est_jaccard") * 5).cast("long"), lit(4L))
          .as("bucket"),
        col("est_jaccard"), col("jaccard"))
  }

  test("identical docs land in the top bucket with exact jaccard 1") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val docs = Seq(
      (1L, base), (2L, base), // exact dup pair
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "completely different words nowhere overlapping at all okay")
    ).toDF("doc_id", "text")
    val rows = curve(docs).collect()
    val dup = rows.filter(r => r.getLong(0) == 4L)
    assert(dup.nonEmpty, "exact dup pair must reach bucket 4")
    assert(dup.forall(_.getDouble(2) == 1.0))
    // no unrelated pair may reach the top bucket
    assert(rows.filter(_.getLong(0) == 4L).forall(_.getDouble(2) == 1.0))
  }

  test("aggregated curve respects the e4 invariants") {
    val got = graft.queries.DedupQueries.queries("dedup_sketch_calibration")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      assert(bucket >= 0 && bucket <= 4)
      assert(r.getAs[Long]("n_pairs") > 0)
      for (c <- Seq("mean_est_e4", "mean_exact_e4", "hit_rate_e4")) {
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 10000, s"$c=$v")
      }
      // the bucket's mean estimate must fall inside the bucket's
      // [floor, ceiling) e4 range (top bucket closed at 10000)
      assert(r.getAs[Long]("mean_est_e4") >= bucket * 2000 &&
        r.getAs[Long]("mean_est_e4") <= math.min(10000, (bucket + 1) * 2000))
    }
  }
}
