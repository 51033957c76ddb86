package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** Streaming <-> batch equivalence over the REAL events table: the
  * driver's events replayed through MemoryStream must produce exactly
  * the rows the (driver-oracled) batch queries produce over the same
  * data — the backfill-equals-stream property a lambda-architecture
  * pipeline depends on. A far-future sentinel event advances the
  * watermark so every real window closes; sums compare at 2 dp (the
  * oracle rounding), absorbing accumulation-order ulps between
  * streaming incremental state and batch hash aggregation.
  */
class StreamBatchEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def tsOf(us: Long): Timestamp =
    Timestamp.from(Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  /** (ts, event_id, value) rows with microsecond timestamps — the
    * shared input of both sides. */
  private lazy val rows: Seq[(Timestamp, Long, Double)] =
    graft.queries.Tables.events(spark, sfDir)
      .select(expr("ts div 1000").as("us"), col("event_id"), col("value"))
      .collect().map(r => (tsOf(r.getLong(0)), r.getLong(1), r.getDouble(2)))
      .toSeq

  private lazy val sentinel: Timestamp =
    tsOf(rows.map(r => r._1.getTime).max * 1000L + 7L * 24 * 3600 * 1000000L)

  private lazy val batchDf: DataFrame =
    rows.toDF("ts", "event_id", "value")

  test("streaming tumblingCounts equals the batch hourly aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamOps.tumblingCounts(
        input.toDF().toDF("ts", "event_id", "value"),
        "ts", "1 hour", "1 minute")
      .writeStream.format("memory").queryName("eq_tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((sentinel, -1L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
      s"""SELECT unix_micros(window_start) AS w, n, round(sum_value, 2) AS s
         |FROM eq_tumbling
         |WHERE window_start < timestamp'${sentinel}'""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = batchDf.groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s"))
      .select(unix_micros(col("w.start")), col("n"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming slidingCounts equals the batch sliding-window aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamOps.slidingCounts(
        input.toDF().toDF("ts", "event_id", "value"),
        "ts", "2 hours", "1 hour", "1 minute")
      .writeStream.format("memory").queryName("eq_sliding")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((sentinel, -1L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
      s"""SELECT unix_micros(window_start) AS w, n, round(sum_value, 2) AS s
         |FROM eq_sliding
         |WHERE window_start < timestamp'${sentinel}'""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = batchDf
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s"))
      .select(unix_micros(col("w.start")), col("n"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stateless curation stages stream: gopher rule table equals batch") {
    // document-level rule filtering is watermark-free (pure narrow
    // expressions), so the same operator body runs unchanged on a
    // stream — the property that lets a curation front-end filter
    // documents on ingest instead of in nightly batches
    implicit val sqlCtx = spark.sqlContext
    val docRows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.GopherRules(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        minWords = 20)
      .writeStream.format("memory").queryName("eq_gopher")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docRows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM eq_gopher")
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.GopherRules(
        docRows.toDF("doc_id", "text"), "doc_id", "text", minWords = 20)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("stream-static incremental dedup equals the batch band-index probe") {
    // the narrow HOF band keys must equal the explode/groupBy form
    // (same MD5 mins), and the streamed join against the static
    // corpus index must produce exactly the batch join's rows
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val batchDocs = docs.filter(col("doc_id") % 10 === 7)

    val narrow = graft.operators.Dedup
      .bandKeysNarrow(batchDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaAgg = graft.operators.Dedup
      .corpusBandIndex(batchDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getString(0))).toSet
    assert(narrow == viaAgg && narrow.nonEmpty)

    val index = graft.operators.Dedup
      .corpusBandIndex(corpus, "doc_id", "text")
    val rows = batchDocs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.dedupAgainstCorpus(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", index)
      .writeStream.format("memory").queryName("eq_incr_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM eq_incr_dedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = StreamOps.dedupAgainstCorpus(
        batchDocs, "doc_id", "text", index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-static hamming dedup equals the batch signature-index probe") {
    // the binary sibling of the band-index test: arriving vectors
    // pack into sign signatures (stateless kernel projection), probe
    // the static corpus signature index on 16-bit bands, popcount
    // verifies. A corpus copy of a streaming vector must surface at
    // dist 0 on every band.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val batchVecs = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") === 5)
      .select((col("vec_id") + 9000L).as("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id"), col("embedding")).unionByName(planted)
    val index = graft.operators.Binary
      .signatureIndex(corpus, "vec_id", "embedding", 64)

    val rows = batchVecs.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamOps.hammingDedupAgainstCorpus(
        input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        index, dim = 64)
      .writeStream.format("memory").queryName("eq_hamming_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM eq_hamming_dedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = StreamOps.hammingDedupAgainstCorpus(
        batchVecs, "vec_id", "embedding", index, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // the planted copy matches its original at distance 0, once per
    // agreeing band (all 4)
    assert(batch.count(t => t._1 == 5L && t._2 == 9005L && t._3 == 0L) == 1)
    assert(spark.sql("SELECT * FROM eq_hamming_dedup")
      .collect().count(r => r.getLong(0) == 5L && r.getLong(1) == 9005L) == 4)
  }

  test("stateless perplexity gate streams: broadcast-model scoring equals batch") {
    // the narrow LM scorer is one projection (map-literal lookups,
    // in-row fold) — no watermark, no state; the model trains batch-
    // side once and ships as literals, so a curation front-end can
    // perplexity-gate documents on ingest
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = graft.operators.LanguageModel.trainNgrams(
      docs.filter(col("doc_id") % 5 === 0), "text", order = 2)
    val rows = docs.select(col("doc_id"), col("text")).limit(200)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.LanguageModel.ngramNllNarrow(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
      .writeStream.format("memory").queryName("eq_perplexity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM eq_perplexity")
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.LanguageModel.ngramNllNarrow(
        rows.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streaming windowedTopK equals the batch per-window rank window") {
    implicit val sqlCtx = spark.sqlContext
    val k = 3
    val input = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamOps.windowedTopK(
        input.toDF().toDF("ts", "event_id", "value"),
        "ts", "event_id", "value", k = k, window_ = "1 hour",
        watermark = "1 minute")
      .writeStream.format("memory").queryName("eq_topk")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((sentinel, -1L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
      s"""SELECT unix_micros(window_start) AS w, id, score, rank
         |FROM eq_topk
         |WHERE window_start < timestamp'${sentinel}'""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // TopKAgg's order is (round-6 score desc, id asc) — the batch
    // window must rank by the same rounded key
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w"))
      .orderBy(round(col("value"), 6).desc, col("event_id").asc)
    val batch = batchDf
      .withColumn("w", unix_micros(window(col("ts"), "1 hour").getField("start")))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select(col("w"), col("event_id"), round(col("value"), 4), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming fingerprintDedupAgainstCorpus equals the batch " +
    "band-probe join on planted near-dup fingerprints") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(19)
    val corpusSigs = (0 until 40).map(i => (i.toLong, rng.nextLong()))
    // stream side: near-copies of corpus items (1-3 flipped bits),
    // plus far signatures (5 flips) and fresh randoms
    def flipped(sig: Long, k: Int): Long =
      (0 until k).foldLeft(sig)((s, _) => s ^ (1L << rng.nextInt(64)))
    val streamSigs = (0 until 15).map(i =>
      (100L + i, flipped(corpusSigs(i)._2, 1 + rng.nextInt(3)))) ++
      (0 until 5).map(i => (200L + i, flipped(corpusSigs(i)._2, 5))) ++
      (0 until 10).map(i => (300L + i, rng.nextLong()))
    val index = graft.operators.Binary.packedSignatureIndex(
      corpusSigs.toDF("id", "fp"), "id", "fp")
    val input = MemoryStream[(Long, Long)]
    val q = StreamOps.fingerprintDedupAgainstCorpus(
        input.toDF().toDF("id", "fp"), "id", "fp", index)
      .writeStream.format("memory").queryName("eq_media")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(streamSigs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("eq_media").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val batch = StreamOps.fingerprintDedupAgainstCorpus(
        streamSigs.toDF("id", "fp"), "id", "fp", index)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(streamed == batch)
    assert(streamed.nonEmpty, "planted near-dups must produce hits")
    // every hit is within the radius; the 5-flip plants stay out
    assert(streamed.forall(_._3 <= 3))
    assert(!streamed.exists(h => h._1 >= 200L && h._1 < 300L &&
      java.lang.Long.bitCount(streamSigs.toMap.apply(h._1) ^
        corpusSigs.toMap.apply(h._2)) > 3))
  }

  test("streaming funnel equals the batch funnel over the real event log") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "view", "click", "purchase")
    val ev = graft.queries.Tables.events(spark, sfDir)
      .select(expr("ts div 1000").as("us"),
        col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"), col("event_type"))
      .collect()
      .map(r => (tsOf(r.getLong(0)), r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
      .sortBy(r => (r._2, r._3)) // the feed's (us, event_id) contract
    // conversion window (45 d) longer than the 30-day log: one
    // journey per user, so stream == batch q_funnel exactly
    val sentinelUs = ev.map(_._2).max + 46L * 86400000000L
    val input = MemoryStream[(Timestamp, Long, Long, Long, String)]
    val q = StreamOps.streamingFunnel(
        input.toDF().toDF("ts", "us", "event_id", "user_id", "event_type"),
        steps, quietDays = 45)
      .writeStream.format("memory").queryName("eq_funnel")
      .outputMode(OutputMode.Append()).start()
    try {
      // three chronological chunks, then two step-type sentinels for
      // user -1 (watermark advance + timeout reap)
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      Seq(0L, 1000000L).foreach { off =>
        input.addData((tsOf(sentinelUs + off), sentinelUs + off,
          -1L, -1L, "signup"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("eq_funnel").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getInt(2)))
      .toSeq.sortBy(_._1)
    val batch = graft.operators.Funnel.funnel(
        graft.queries.Tables.events(spark, sfDir)
          .withColumn("us", expr("ts div 1000")),
        "user_id", "us", "event_id", "event_type", steps)
      .collect()
      .map { r =>
        val times = (1 to 4).flatMap(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))).toList
        (r.getLong(0), times, r.getInt(5))
      }.toSeq.sortBy(_._1)
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming funnel conversion window: a quiet gap past the window " +
    "closes the journey and a return starts a new one") {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    // user 1: signup+view, then quiet past the 1-day window, then a
    // full journey. User 2's day-3 events drive the watermark past
    // user 1's window BEFORE the return (the watermark lags one
    // batch, so two driver batches precede it) — user 1 then emits
    // TWO journey rows: depth 2, then depth 4.
    // base offset: an event at us = 0 TIES the initial watermark and
    // is dropped as late by the stateful operator — plant well past it
    val b0 = 100 * day
    val batches = Seq(
      Seq((b0, 1L, 1L, "signup"), (b0 + day / 2, 2L, 1L, "view")),
      Seq((b0 + 3 * day, 10L, 2L, "signup")),       // advances wm
      Seq((b0 + 3 * day + 1, 11L, 2L, "signup")),   // fires u1's timeout
      Seq((b0 + 4 * day, 3L, 1L, "signup"),
        (b0 + 4 * day + 1, 4L, 1L, "view"),
        (b0 + 4 * day + 2, 5L, 1L, "click"),
        (b0 + 4 * day + 3, 6L, 1L, "purchase")),
      Seq((b0 + 60 * day, -1L, -1L, "signup")),     // sentinel: advance
      Seq((b0 + 60 * day + 1000000L, -2L, -1L, "signup"))) // reap
      .map(_.map { case (us, eid, u, t) => (tsOf(us), us, eid, u, t) })
    val input = MemoryStream[(Timestamp, Long, Long, Long, String)]
    val q = StreamOps.streamingFunnel(
        input.toDF().toDF("ts", "us", "event_id", "user_id", "event_type"),
        Seq("signup", "view", "click", "purchase"), quietDays = 1)
      .writeStream.format("memory").queryName("eq_funnel_window")
      .outputMode(OutputMode.Append()).start()
    try batches.foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.table("eq_funnel_window")
      .filter(col("user_id") === 1L).collect()
      .map(r => (r.getSeq[Long](1).toList, r.getInt(2))).toSeq
      .sortBy(_._1.headOption.getOrElse(Long.MaxValue))
    assert(u1 == Seq(
      (List(b0, b0 + day / 2), 2),
      (List(b0 + 4 * day, b0 + 4 * day + 1,
        b0 + 4 * day + 2, b0 + 4 * day + 3), 4)))
  }
}
