package graft

import org.apache.spark.sql.functions._

/** Pins Spark's session_window merge semantics at the exact-gap
  * boundary: the batch q_sessionize splits on STRICTLY greater than
  * the gap (diff == gap stays one session), so the streaming twin's
  * gap duration must make session_window agree. This spec documents
  * which side Spark's merge takes and guards that NO +1us adjustment
  * is needed — session_window's inclusive exactly-gap merge already
  * matches the batch strict-> split, so stream_sessionize passes the
  * plain 30-minute gap; if a Spark version ever flips the boundary,
  * this is the spec that fails.
  */
class SessionBoundarySpec extends SparkSpec {

  test("session_window boundary: diff == gap vs diff == gap+1") {
    import spark.implicits._
    // two events exactly 30 min apart, two events 30 min + 1us apart
    val df = Seq(
      (1L, 0L), (1L, 1800000000L),
      (2L, 0L), (2L, 1800000001L)
    ).toDF("uid", "us").withColumn("ts", timestamp_micros(col("us")))
    def sessions(gap: String): Map[Long, Long] =
      df.groupBy(col("uid"), session_window(col("ts"), gap))
        .agg(count(lit(1)))
        .groupBy("uid").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch q_sessionize semantics: uid 1 (diff == gap) ONE session,
    // uid 2 (diff == gap+1us) TWO sessions. Spark's session_window
    // merges INCLUSIVELY at the boundary (events exactly gap apart
    // stay one session), so the plain gap string reproduces the
    // batch query's strict-> split and stream_sessionize needs no
    // +1us adjustment. If this assertion ever fails on a Spark
    // upgrade, stream_sessionize's gap must change with it.
    assert(sessions("30 minutes") == Map(1L -> 1L, 2L -> 2L))
  }
}
