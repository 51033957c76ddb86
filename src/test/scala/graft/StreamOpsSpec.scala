package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.SessionEvent

/** Structured Streaming operators driven through MemoryStream. */
class StreamOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window with watermark aggregates counts per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val events = input.toDF().toDF("ts", "value")
    val q = StreamOps.tumblingCounts(events, "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(1), 1.0), (ts(2), 2.0), (ts(11), 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData((ts(59), 9.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT n, sum_value FROM tumbling ORDER BY window_start")
        .collect().map(_.toSeq.toList).toList
      assert(rows.take(2) == List(List(2L, 3.0), List(1L, 3.0)))
    } finally q.stop()
  }

  test("sliding window counts events in overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val events = input.toDF().toDF("ts", "value")
    val q = StreamOps.slidingCounts(events, "ts", "10 minutes", "5 minutes", "5 minutes")
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(7), 1.0), (ts(8), 2.0))
      q.processAllAvailable()
      input.addData((ts(59), 9.0))
      q.processAllAvailable()
      // minutes 7 and 8 fall in both the [10:00,10:10) and [10:05,10:15) windows
      val rows = spark.sql("SELECT n, sum_value FROM sliding ORDER BY window_start")
        .collect().map(_.toSeq.toList).toList
      assert(rows.take(2) == List(List(2L, 3.0), List(2L, 3.0)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops repeated keys inside the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    val q = StreamOps.dedupWithinWatermark(events, "ts", Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, ts(0), 1.0), (1L, ts(1), 1.0), (2L, ts(2), 5.0))
      q.processAllAvailable()
      input.addData((1L, ts(3), 7.0)) // still a dup within the horizon
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id FROM deduped ORDER BY event_id")
        .collect().map(_.getLong(0)).toList
      assert(rows == List(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join matches key within the time window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = StreamOps.intervalJoin(
      purchases.toDF().toDF("user_id", "p_ts", "amount"),
      clicks.toDF().toDF("user_id", "c_ts", "page"),
      Seq("user_id"), "p_ts", "c_ts",
      before = "10 MINUTES", after = "0 MINUTES", watermark = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((1L, ts(0), "home"), (1L, ts(25), "pricing"), (2L, ts(1), "home"))
      purchases.addData((1L, ts(8), 9.99), (2L, ts(30), 5.0))
      q.processAllAvailable()
      clicks.addData((9L, ts(59), "x")); purchases.addData((9L, ts(59), 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, page FROM attributed WHERE user_id < 9 ORDER BY user_id, page")
        .collect().map(_.toSeq.toList).toList
      // user 1: click at :00 within 10 min before purchase at :08;
      // the :25 click is after the purchase (after=0) -> excluded;
      // user 2: click at :01 is 29 min before purchase -> excluded
      assert(rows == List(List(1L, "home")))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StreamOps.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 7: two events 5 min apart, then a 40-min gap opens a new
      // session (closing the first)
      input.addData(
        SessionEvent(7L, ts(0), 1.0), SessionEvent(7L, ts(5), 1.0))
      q.processAllAvailable()
      input.addData(SessionEvent(7L, ts(45), 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events FROM sessions ORDER BY start_us")
        .collect().map(_.toSeq.toList).toList
      assert(rows == List(List(7L, 2L)))
    } finally q.stop()
  }

  test("windowedTopK emits the k best per closed window with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "id", "score")
    val q = StreamOps.windowedTopK(events, "ts", "id", "score",
        k = 2, window_ = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("wtopk")
      .outputMode(OutputMode.Append()).start()
    try {
      // one window, four candidates across two triggers
      input.addData((ts(1), 101L, 0.5), (ts(2), 102L, 0.9))
      q.processAllAvailable()
      input.addData((ts(3), 103L, 0.7), (ts(4), 104L, 0.9))
      q.processAllAvailable()
      input.addData((ts(59), 999L, 0.1)) // advance watermark, close window
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT id, score, rank FROM wtopk WHERE id < 900 ORDER BY rank")
        .collect().map(_.toSeq.toList).toList
      // ties at 0.9 break by id asc: 102 before 104
      assert(rows == List(List(102L, 0.9, 1L), List(104L, 0.9, 2L)))
    } finally q.stop()
  }

  test("windowed aggregate streams into a parquet file sink with checkpoint recovery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val input = MemoryStream[(Timestamp, Double)]
    val events = input.toDF().toDF("ts", "value")
    def start() = StreamOps.tumblingCounts(events, "ts", "10 minutes", "5 minutes")
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append()).start()
    val q = start()
    try {
      input.addData((ts(1), 1.0), (ts(2), 2.0))
      q.processAllAvailable()
      input.addData((ts(31), 3.0)) // watermark closes the first window
      q.processAllAvailable()
    } finally q.stop()
    val afterFirst = spark.read.parquet(s"$dir/out")
      .as[(Timestamp, Long, Double)].collect().toSet
    assert(afterFirst.map(r => (r._2, r._3)) == Set((2L, 3.0)))
    // restart from the checkpoint: state (open windows, watermark)
    // recovers; only the newly closed window is appended, no replays
    val q2 = start()
    try {
      input.addData((ts(59), 9.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val afterRestart = spark.read.parquet(s"$dir/out")
      .as[(Timestamp, Long, Double)].collect().toSet
    assert(afterRestart.map(r => (r._2, r._3)) == Set((2L, 3.0), (1L, 3.0)))
  }

  test("zscoreAnomalies flags outliers after warmup, with exact Welford state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StreamOps.zscoreAnomalies(input.toDS(), zThreshold = 3.0, warmup = 10L)
      .writeStream.format("memory").queryName("anomalies")
      .outputMode(OutputMode.Append()).start()
    try {
      // warmup: 12 calm values around 10 +- 1 for user 1; user 2 stays calm
      val calm = (0 until 12).map(i =>
        SessionEvent(1L, ts(i), 10.0 + (if (i % 2 == 0) 1.0 else -1.0)))
      input.addData(calm: _*)
      input.addData((0 until 12).map(i => SessionEvent(2L, ts(i), 5.0 + i * 0.1)): _*)
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM anomalies").head().getLong(0) == 0L)
      // outlier for user 1 only: mean 10, sd ~1.04 -> z ~ +38
      input.addData(SessionEvent(1L, ts(20), 50.0), SessionEvent(2L, ts(20), 5.9))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, value, z_e2 FROM anomalies")
        .collect().map(_.toSeq.toList).toList
      assert(rows.size == 1 && rows.head(0) == 1L && rows.head(1) == 50.0)
      assert(rows.head(2).asInstanceOf[Long] > 300L)
      // state persists across triggers: a later calm value stays quiet
      input.addData(SessionEvent(1L, ts(21), 10.5))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM anomalies").head().getLong(0) == 1L)
    } finally q.stop()
  }

  test("windowedDriftJs emits batch-identical JS rows when a window closes") {
    import spark.implicits._
    import graft.streaming.StreamOps.DriftEvent
    implicit val sqlCtx = spark.sqlContext
    val refCounts = Map("en" -> 60L, "de" -> 30L, "fr" -> 10L)
    val input = MemoryStream[DriftEvent]
    val q = StreamOps.windowedDriftJs(input.toDS(), refCounts,
        windowMinutes = 10, lateMinutes = 5)
      .writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [0,10): a shifted mix (heavy de, a category ref lacks)
      input.addData(
        DriftEvent(ts(1), "en"), DriftEvent(ts(2), "de"),
        DriftEvent(ts(3), "de"), DriftEvent(ts(4), "de"),
        DriftEvent(ts(5), "zh"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM drift").head().getLong(0) == 0L,
        "window must stay open until the watermark passes")
      // watermark advances at END of a batch; the timeout fires on
      // the NEXT trigger — so one batch to move it, one to reap
      input.addData(DriftEvent(ts(40), "en"))
      q.processAllAvailable()
      input.addData(DriftEvent(ts(41), "en"))
      q.processAllAvailable()
      val win0 = {
        val us = ts(0).getTime * 1000L
        val w = 10L * 60L * 1000000L
        Math.floorDiv(us, w) * w
      }
      val got = spark.sql(
        s"""SELECT key, ref_n, cur_n, contrib_e6 FROM drift
           |WHERE window_start_us = $win0 ORDER BY key""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toList
      // batch twin on the same window slice
      val ref = refCounts.toSeq.flatMap { case (k, n) =>
        Seq.fill(n.toInt)(k) }.toDF("key")
      val cur = Seq("en", "de", "de", "de", "zh").toDF("key")
      val want = graft.operators.Drift.jsCategorical(ref, cur, "key")
        .orderBy("key")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toList
      assert(got == want, s"streaming $got vs batch $want")
      assert(got.map(_._1) == List("de", "en", "fr", "zh"))
    } finally q.stop()
  }
}
