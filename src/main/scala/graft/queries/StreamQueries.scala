package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}
import graft.operators.{Binary, Dedup, Multimodal}
import graft.streaming.StreamOps

/** Driver-gate queries that execute the ACTUAL Structured Streaming
  * micro-batch path — a FILE-STREAM source (one pre-written parquet
  * file per micro-batch, `maxFilesPerTrigger = 1`) through a
  * streaming plan into a memory sink — and hand the sink's table to
  * the DuckDB oracle. The batch twins of these operators are oracled
  * elsewhere and `StreamBatchEquivalenceSpec` pins stream==batch in
  * ScalaTest; these entries put the streaming EXECUTION MODE itself
  * (micro-batch planner, IncrementalExecution, watermark/state-store
  * commits, sink commit) under the external-engine gate.
  *
  * Harness contract: the feed files are built ONCE per scale factor
  * by [[Fixtures]] (outside any timed region) and streamed through
  * Spark's own FileStreamSource — the same source class a production
  * ingest directory uses, and nothing ever materializes the streamed
  * corpus on the driver (the old MemoryStream harness collect()ed it
  * per run, which dominated the 10x scale probe). Stateless
  * per-batch operators are chosen deliberately: their output is
  * independent of micro-batch boundaries, so the result is
  * deterministic and engine-replayable.
  */
object StreamQueries {

  private val K = 12 // minhash signature length (matches DedupQueries)
  private val BANDS = 4
  private val sinkIds = new java.util.concurrent.atomic.AtomicInteger

  /** Stream-static MinHash dedup on ingest, executed as a REAL
    * streaming query: documents with doc_id % 10 == 7 arrive in three
    * micro-batch files and probe the static corpus band index
    * ([[Dedup.corpusBandIndex]] over the other 90%); every band hit
    * is appended to the sink. Output = (doc_id, corpus_id, band_key)
    * per shared band — the raw ingest-alert stream
    * [[StreamOps.dedupAgainstCorpus]] documents. */
  private def dedupIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // slot-persisted: at 100 TB this index is computed once on corpus
    // entry and stored bucketed by band_key — recomputing the MinHash
    // signatures per micro-run is the fixture's stand-in, so keep the
    // computed index warm across bench/probe repeats
    val index = graft.operators.PersistSlots.swap("stream.dedupIngestIndex",
      Dedup.corpusBandIndex(
        docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", K, BANDS))
    val feedDir = Fixtures.streamDedupFeed(spark, dir)
    val input = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
    val streamed = StreamOps.dedupAgainstCorpus(
      input, "doc_id", "text", index, numHashes = K, bands = BANDS)
    val sink = s"graft_stream_dedup_sink_${sinkIds.incrementAndGet()}"
    val q = streamed.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // unbind the catalog name (see driftMonitor): the resolved frame
    // outlives the temp view, and bench trials must not accumulate
    // named sink tables
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    out
  }

  /** The STATEFUL streaming path under the gate: the windowed drift
    * monitor ([[StreamOps.windowedDriftJs]] —
    * flatMapGroupsWithState + event-time timeouts) over the events
    * table's odd half against the even half's reference counts,
    * executed as a real micro-batch query. The ts-sorted feed runs
    * in three micro-batches; two far-future sentinel batches then
    * advance the watermark (one to move it, one to reap the
    * timeouts — the state-store eviction path itself under test), so
    * every REAL daily window closes and emits while the sentinel's
    * own window stays open and unemitted. Deterministic: a window's
    * events all precede the watermark that closes it (sorted feed),
    * so batch boundaries cannot change any window's counts. */
  private def driftMonitor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(col("event_id").cast("long").as("event_id"), col("event_type"))
    // reference counts: a bounded per-event-type aggregate (rows =
    // distinct event types), the model-broadcast collect every drift
    // monitor ships — NOT a corpus materialization
    val refCounts: Map[String, Long] = ev.filter(col("event_id") % 2 === 0)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // feed = three ts-ordered tertile files + two watermark/timeout
    // sentinel files TWO days out (the last real window's timeout is
    // its end <= max + 1 day, and the final watermark is sentinel -
    // lateness — a one-day margin would shrink to ~10 minutes and
    // silently leave the last window open whenever the max event
    // lands just after a UTC midnight). Built once per sf by Fixtures.
    val feedDir = Fixtures.streamDriftFeed(spark, dir)
    val hasBatches = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(feedDir))
      try l.anyMatch(p => p.getFileName.toString.startsWith("batch_"))
      finally l.close()
    }
    if (!hasBatches)
      return spark.emptyDataset[StreamOps.DriftRow].toDF()
    val input = spark.readStream
      .schema(StructType(Seq(StructField("ts", TimestampType),
        StructField("key", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
      .as[StreamOps.DriftEvent]
    val sink = s"graft_stream_drift_sink_${sinkIds.incrementAndGet()}"
    // streaming STATE partitions are frozen from the session conf at
    // query start; the per-batch cost here is state-store commits x
    // partitions x micro-batches, and the group count (windows) is
    // tiny — 8 partitions cuts the fixed commit overhead without
    // changing semantics. Restored after start (the value is only
    // read once).
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try StreamOps.windowedDriftJs(input, refCounts,
          windowMinutes = 1440, lateMinutes = 10)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try q.processAllAvailable() finally q.stop()
    // unbind the catalog name: the returned frame keeps the resolved
    // in-memory plan, and repeated invocations (bench trials) must
    // not accumulate named sink tables for the session's lifetime
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    out
  }

  /** Stream-static MEDIA fingerprint dedup on ingest, executed as a
    * REAL streaming query: binary image payloads (doc_id % 10 == 7)
    * arrive in three micro-batch files, each decodes to its dHash
    * perceptual fingerprint IN the streaming plan, and probes the
    * static corpus fingerprint index
    * ([[graft.operators.Binary.packedSignatureIndex]] over the other
    * 90% — 4 band rows per item, payload bytes never indexed); every
    * within-radius hit appends to the sink. Stateless per batch.
    * Output = (doc_id, corpus_id, dist) per shared band — the raw
    * ingest-alert stream
    * [[StreamOps.fingerprintDedupAgainstCorpus]] documents. */
  private def mediaIngest(spark: SparkSession, dir: String): DataFrame = {
    val corpus = MultimodalQueries.structuredImages(spark, dir)
      .filter(col("doc_id") % 10 =!= 7)
    // slot-persisted like the minhash index: at 100 TB this is built
    // once on corpus entry and stored bucketed by (band, key)
    val index = graft.operators.PersistSlots.swap("stream.mediaIngestIndex",
      Binary.packedSignatureIndex(
        Multimodal.dHash64(corpus, "payload")
          .select(col("doc_id"), col("phash")),
        "doc_id", "phash"))
    val feedDir = Fixtures.streamMediaFeed(spark, dir)
    val input = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
    val sigs = Multimodal.dHash64(input, "payload")
      .select(col("doc_id"), col("phash"))
    val streamed = StreamOps.fingerprintDedupAgainstCorpus(
      sigs, "doc_id", "phash", index)
    val sink = s"graft_stream_media_sink_${sinkIds.incrementAndGet()}"
    val q = streamed.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    out
  }

  /** The STATEFUL per-entity streaming path: the ordered-step funnel
    * ([[StreamOps.streamingFunnel]] — per-user state, event-time
    * quiet-window timeouts) over the whole event log as a real
    * micro-batch query. The (us, event_id)-sorted feed runs in three
    * micro-batches; two sentinel batches (step-type rows for user -1,
    * 46 days out) advance the watermark past every user's last event
    * + the 45-day conversion window (one to move it, one to fire the
    * timeouts), so every real user's final funnel row emits — while
    * user -1's own timeout sits beyond the final watermark and its
    * group stays open, unemitted. The window exceeds the 30-day log,
    * so every user is ONE journey and the oracle is the BATCH
    * q_funnel SQL verbatim (a short window would legitimately emit
    * one row per quiet-separated journey — that product semantics is
    * pinned in StreamBatchEquivalenceSpec, not gated here). */
  private def funnelMonitor(spark: SparkSession, dir: String): DataFrame = {
    val feedDir = Fixtures.streamFunnelFeed(spark, dir)
    val input = spark.readStream
      .schema(StructType(Seq(StructField("ts", TimestampType),
        StructField("us", LongType), StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
    val steps = Seq("signup", "view", "click", "purchase")
    val sink = s"graft_stream_funnel_sink_${sinkIds.incrementAndGet()}"
    // few state groups (users), many state partitions = fixed commit
    // overhead per micro-batch; 8 partitions, same as driftMonitor
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try StreamOps.streamingFunnel(input, steps, quietDays = 45)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    out.select(col("user_id") +:
      steps.zipWithIndex.map { case (st, i) =>
        get(col("times"), lit(i)).as(s"t_${st}_us") } :+
      col("depth"): _*)
  }

  /** SKETCHES under the streaming gate: per-day tumbling-window
    * distinct-user HLL (`approx_count_distinct`) per event type, as a
    * real watermarked micro-batch aggregation — the shape a
    * production ingest dashboard runs (mergeable sketch partials in
    * the state store, no exact distinct state). Feed = the funnel
    * fixture (whole log, ts-sorted tertiles + two far-future
    * sentinels that close every real window while their own stays
    * open, unemitted). Verification is the q_approx_distinct
    * bound-check discipline: the sink's estimate is NOT shipped
    * (HLL merge order rides micro-batch boundaries); the output is
    * the exact batch count per emitted cell plus a within-3*rsd
    * verdict on the streamed estimate. */
  private def approxUsersMonitor(spark: SparkSession, dir: String): DataFrame = {
    val rsd = 0.02
    val feedDir = Fixtures.streamFunnelFeed(spark, dir)
    val input = spark.readStream
      .schema(StructType(Seq(StructField("ts", TimestampType),
        StructField("us", LongType), StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
    val agg = input.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("__approx"),
        count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("__approx"), col("n_events"))
    val sink = s"graft_stream_users_sink_${sinkIds.incrementAndGet()}"
    // window-agg state: few groups, so 8 state partitions (the
    // driftMonitor fixed-commit-overhead discipline)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try agg.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    // judge leg: exact distinct per emitted cell, batch-side — the
    // estimate itself never reaches the gate, only the verdict.
    // Slot-persisted: static per corpus (the dedup-index discipline),
    // and tiny — one row per (day, type) cell.
    val exact = graft.operators.PersistSlots.swap("stream.approxUsersExact",
      Tables.events(spark, dir)
        .select(expr("ts div 1000").as("us"), col("user_id"),
          col("event_type"))
        .groupBy(expr("us div 86400000000 * 86400000000")
          .as("window_start_us"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users")))
    out.join(exact, Seq("window_start_us", "event_type"))
      .select(col("window_start_us"), col("event_type"),
        col("exact_users"), col("n_events"),
        (abs(col("__approx") - col("exact_users")).cast("double") /
          col("exact_users") <= lit(3 * rsd)).cast("int")
          .as("within_bound"))
  }

  /** The FILE-SINK path under the gate: the same stream-static band
    * probe as [[dedupIngest]], but committed through the checkpointed
    * PARQUET sink (exactly-once file commit log + manifest) instead
    * of the memory sink — the path a production ingest job actually
    * writes, including the _spark_metadata manifest a downstream
    * reader consults to see only committed files. Sink + checkpoint
    * dirs live in a per-session scratch slot wiped on re-entry
    * (fixture-scale data; bench loops don't leak dirs); the result
    * is the committed files read BACK through the batch reader, so
    * the gate hashes exactly what a downstream consumer would see. */
  private def dedupIngestFileSink(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val index = graft.operators.PersistSlots.swap("stream.dedupIngestIndex",
      Dedup.corpusBandIndex(
        docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", K, BANDS))
    val feedDir = Fixtures.streamDedupFeed(spark, dir)
    val input = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
    val streamed = StreamOps.dedupAgainstCorpus(
      input, "doc_id", "text", index, numHashes = K, bands = BANDS)
    val base = Fixtures.scratch("fsink")
    val outDir = base.resolve("out").toString
    val q = streamed.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir)
  }

  /** UPDATE-mode stateful CDC upsert under the gate
    * ([[StreamOps.streamingLatest]] — the one streaming output mode
    * the other five entries don't exercise): the whole event log
    * streams through latest-wins keyed state; every batch re-emits
    * each touched key's current latest into the sink, and the final
    * projection takes each key's overall latest and drops tombstones
    * ('error' rows) — the oracle is the batch CDC-merge replay.
    * Deterministic whatever the batch boundaries: a latest-wins
    * state is monotone. The watermark sentinels (user -1) are
    * harness plumbing, filtered before the gate. */
  private def cdcUpsertMonitor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val feedDir = Fixtures.streamFunnelFeed(spark, dir)
    val input = spark.readStream
      .schema(StructType(Seq(StructField("ts", TimestampType),
        StructField("us", LongType), StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
      .select(col("user_id").as("k"), col("us").as("t"),
        col("event_id").as("tie"), col("event_type").as("typ"))
      .as[StreamOps.UpsertEvent]
    val sink = s"graft_stream_upsert_sink_${sinkIds.incrementAndGet()}"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try StreamOps.streamingLatest(input)
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    // per key: the overall latest among the per-batch emissions
    // (monotone, so this IS the final state), tombstones dropped,
    // sentinels excluded
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").desc, col("tie").desc)
    out.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("typ") =!= "error" &&
        col("k") >= 0)
      .select(col("k").as("user_id"), col("t").as("ts_us"),
        col("typ").as("event_type"))
  }

  /** NATIVE session windows under the streaming gate: Spark's
    * `session_window` aggregation (30-minute gap) over the whole
    * event log, append mode — a (user, session) row emits when the
    * watermark passes the session's close. This is the production
    * streaming shape of q_sessionize (gap-windows are built-in
    * merging state, one row per OPEN session per user in the store —
    * bounded — vs the funnel's flatMapGroupsWithState custom state).
    *
    * Boundary semantics: session_window merges INCLUSIVELY at
    * exactly-gap spacing (pinned by SessionBoundarySpec), which
    * equals the batch query's strict `> 30 min` split — so the plain
    * gap string needs no adjustment and the oracle is the batch
    * q_sessionize SQL verbatim. Feed = the funnel fixture
    * ((us, event_id)-sorted tertiles, so nothing is late under a
    * zero-delay watermark; two far-future sentinels close every real
    * user's last session while their own stays open, unemitted —
    * user -1 filtered before the gate). The final per-user fold
    * (n_sessions, n_events) is a batch projection over the sink. */
  private def sessionizeMonitor(spark: SparkSession, dir: String): DataFrame = {
    val feedDir = Fixtures.streamFunnelFeed(spark, dir)
    val input = spark.readStream
      .schema(StructType(Seq(StructField("ts", TimestampType),
        StructField("us", LongType), StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
    val sink = s"graft_stream_sessionize_sink_${sinkIds.incrementAndGet()}"
    // few state groups, 8 state partitions (the driftMonitor sizing)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try input
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("__n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    out.filter(col("user_id") =!= -1L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("__n")).as("n_events"))
  }

  /** STREAM-STREAM JOIN under the gate — the one Structured
    * Streaming surface the other entries don't exercise (two
    * watermarked sources, symmetric join state, time-range
    * condition, left-outer null emission on state timeout): view →
    * purchase attribution, each view left-joined to every purchase
    * by the same user within the following hour. Both sides read
    * the SAME funnel feed (two FileStreamSources advance in
    * lockstep, one file per side per micro-batch); the time-range
    * condition bounds the join state (a view evicts once the
    * watermark passes view_ts + 1h — and the feed's global
    * (us, event_id) sort guarantees its matches have all arrived by
    * then, so eviction can never lose a pair). Far-future sentinels
    * (user -1) pass BOTH event-type filters so each side's
    * watermark — and therefore the query's global minimum — clears
    * every real view's window, firing the outer join's null-padded
    * emissions for never-converted views; the sentinels' own
    * self-match is filtered before the gate. Oracle = the batch
    * interval left-join replay (pair multiset is batch-boundary
    * independent). */
  private def attributionMonitor(spark: SparkSession, dir: String): DataFrame = {
    val feedDir = Fixtures.streamFunnelFeed(spark, dir)
    def src = spark.readStream
      .schema(StructType(Seq(StructField("ts", TimestampType),
        StructField("us", LongType), StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
    val views = src.withWatermark("ts", "0 seconds")
      .filter(col("event_type") === "view" || col("user_id") === -1L)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"), col("us").as("view_us"))
    val purchases = src.withWatermark("ts", "0 seconds")
      .filter(col("event_type") === "purchase" || col("user_id") === -1L)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("us").as("purchase_us"))
    val sink = s"graft_stream_attr_sink_${sinkIds.incrementAndGet()}"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try views.join(purchases,
          expr("v_user = p_user AND p_ts >= v_ts AND " +
            "p_ts <= v_ts + interval 1 hour"), "leftOuter")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    out.filter(col("v_user") =!= -1L)
      .select(col("v_user").as("user_id"), col("view_id"), col("view_us"),
        col("purchase_id"), col("purchase_us"))
  }

  /** AT-LEAST-ONCE REDELIVERY DEDUP under the gate: the idempotent
    * ingest primitive (`dropDuplicatesWithinWatermark`) that turns an
    * at-least-once source (Kafka redelivery, retried file drops)
    * into exactly-once rows. The duplicate feed is REAL: two
    * FileStreamSources over the same directory union into one stream
    * — every micro-batch delivers every event twice — and the keyed
    * dedup state (bounded by the watermark: an event_id evicts once
    * the watermark clears its event time) lets exactly the first
    * arrival through. Oracle = the event log, each event once — the
    * whole point is that the doubled delivery is invisible
    * downstream. Sentinels (user -1) advance the watermark through
    * the union and are filtered before the gate. */
  private def redeliveryDedupMonitor(spark: SparkSession, dir: String): DataFrame = {
    val feedDir = Fixtures.streamFunnelFeed(spark, dir)
    def src = spark.readStream
      .schema(StructType(Seq(StructField("ts", TimestampType),
        StructField("us", LongType), StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$feedDir/batch_*.parquet")
    val sink = s"graft_stream_rdd_sink_${sinkIds.incrementAndGet()}"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try src.unionByName(src)
        .withWatermark("ts", "1 second")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    out.filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("event_id"), col("us").as("ts_us"),
        col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_redelivery_dedup" -> ((s, dir) => redeliveryDedupMonitor(s, dir)),
    "stream_attribution" -> ((s, dir) => attributionMonitor(s, dir)),
    "stream_sessionize" -> ((s, dir) => sessionizeMonitor(s, dir)),
    "stream_dedup_ingest" -> ((s, dir) => dedupIngest(s, dir)),
    "stream_sink_parquet" -> ((s, dir) => dedupIngestFileSink(s, dir)),
    "stream_cdc_upsert" -> ((s, dir) => cdcUpsertMonitor(s, dir)),
    "stream_drift_monitor" -> ((s, dir) => driftMonitor(s, dir)),
    "stream_media_ingest" -> ((s, dir) => mediaIngest(s, dir)),
    "stream_funnel" -> ((s, dir) => funnelMonitor(s, dir)),
    "stream_approx_users" -> ((s, dir) => approxUsersMonitor(s, dir))
  )

  // DuckDB replay of the whole streaming pipeline: identical MinHash
  // signature + band-key arithmetic as DedupQueries' minhash oracle
  // (md5 shingle hashes, '#'-joined band slices), restricted to
  // stream-side (doc_id % 10 = 7) probing corpus-side rows. One row
  // per shared band — the same multiset the append sink accumulates.
  private val dedupIngestOracle: String = {
    // sketch pieces shared with DedupQueries' oracles — one
    // generator, one K/BANDS lockstep
    val sigCols = DedupQueries.minhashSigCols
    val bandExprs = DedupQueries.minhashBandExprs
    s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
       |      FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |         unnest(list_transform(generate_series(1, len(w) - 2),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
       |       FROM w WHERE len(w) >= 3),
       |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
       |bands AS (SELECT doc_id, unnest([$bandExprs]) AS band_key FROM sig)
       |SELECT a.doc_id AS doc_id, b.doc_id AS corpus_id,
       |  a.band_key AS band_key
       |FROM bands a JOIN bands b ON a.band_key = b.band_key
       |WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7""".stripMargin
  }

  // DuckDB replay of every CLOSED window's emitted rows: per daily
  // window of the odd half, the union key set (reference keys ∪ the
  // window's keys), add-one smoothing over it, and the two
  // separately-floored JS halves — the identical association the
  // operator folds in its timeout branch. The sentinel window never
  // closes, so the oracle covers exactly the real windows.
  private val driftMonitorOracle: String =
    """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS us FROM events),
      |ref AS (SELECT event_type AS key, count(*) AS rn
      |        FROM e WHERE event_id % 2 = 0 GROUP BY 1),
      |cur AS (SELECT (us // 86400000000) * 86400000000 AS w,
      |          event_type AS key, count(*) AS cn
      |        FROM e WHERE event_id % 2 = 1 GROUP BY 1, 2),
      |keys AS (SELECT wins.w, r.key
      |         FROM (SELECT DISTINCT w FROM cur) wins CROSS JOIN ref r
      |         UNION SELECT w, key FROM cur),
      |nrt AS (SELECT sum(rn) AS nr FROM ref),
      |nct AS (SELECT w, sum(cn) AS nc FROM cur GROUP BY 1),
      |nkt AS (SELECT w, count(*) AS nk FROM keys GROUP BY 1),
      |s AS (SELECT k.w, k.key,
      |        coalesce(r.rn, 0) AS rn, coalesce(c.cn, 0) AS cn,
      |        CAST(coalesce(r.rn, 0) + 1 AS DOUBLE)
      |          / CAST(nrt.nr + nkt.nk AS DOUBLE) AS p,
      |        CAST(coalesce(c.cn, 0) + 1 AS DOUBLE)
      |          / CAST(nct.nc + nkt.nk AS DOUBLE) AS q
      |      FROM keys k
      |      LEFT JOIN ref r ON r.key = k.key
      |      LEFT JOIN cur c ON c.w = k.w AND c.key = k.key
      |      JOIN nct ON nct.w = k.w
      |      JOIN nkt ON nkt.w = k.w
      |      CROSS JOIN nrt)
      |SELECT w AS window_start_us, key,
      |  CAST(rn AS BIGINT) AS ref_n, CAST(cn AS BIGINT) AS cur_n,
      |  CAST(floor(500000.0 * p * ln(p / ((p + q) / 2.0))) +
      |       floor(500000.0 * q * ln(q / ((p + q) / 2.0)))
      |    AS BIGINT) AS contrib_e6
      |FROM s""".stripMargin

  // DuckDB replay of the whole media-ingest pipeline: the SAME dHash
  // arithmetic as the mm_phash oracle (shared phashSqlExpr — the PNG
  // round-trip is lossless), stream side (doc_id % 10 = 7) against
  // corpus side, one row per AGREEING 16-bit band of each
  // within-radius pair — the multiset the append sink accumulates.
  // The band test masks after the shift, so x's sign (bit 63) never
  // leaks into a key.
  private def mediaIngestOracle: String = {
    val hash = MultimodalQueries.phashSqlExpr
    s"""WITH h AS (SELECT doc_id, CAST($hash AS BIGINT) AS phash
       |           FROM documents),
       |ing AS (SELECT doc_id, phash FROM h WHERE doc_id % 10 = 7),
       |cor AS (SELECT doc_id AS corpus_id, phash AS cp
       |        FROM h WHERE doc_id % 10 <> 7),
       |pr AS (SELECT i.doc_id, c.corpus_id, xor(i.phash, c.cp) AS x
       |       FROM ing i CROSS JOIN cor c)
       |SELECT doc_id, corpus_id, CAST(bit_count(x) AS BIGINT) AS dist
       |FROM pr CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) u
       |WHERE ((x >> (16 * u.b)) & 65535) = 0 AND bit_count(x) <= 3""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the doubled delivery must be invisible: the oracle is the
    // plain event log, each event exactly once
    "stream_redelivery_dedup" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |FROM events""".stripMargin,
    // stream == batch: the attributed pair multiset is a pure
    // function of the event times (batch boundaries only change WHEN
    // a pair emits, never WHETHER) — the oracle is the batch
    // interval left-join
    "stream_attribution" ->
      """WITH v AS (SELECT user_id, event_id AS view_id,
        |             epoch_us(ts) AS view_us
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id,
        |        epoch_us(ts) AS purchase_us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id, v.view_id, v.view_us,
        |  p.purchase_id, p.purchase_us
        |FROM v LEFT JOIN p
        |  ON p.user_id = v.user_id
        |  AND p.purchase_us >= v.view_us
        |  AND p.purchase_us <= v.view_us + 3600000000""".stripMargin,
    // stream == batch: session membership is a pure function of the
    // event times once every session closes (the sentinels close all
    // real ones), so the oracle is the batch q_sessionize replay
    "stream_sessionize" -> EventQueries.oracles("q_sessionize"),
    "stream_dedup_ingest" -> dedupIngestOracle,
    // the sink changes WHERE rows land, not which rows exist: the
    // committed-files read-back must equal the memory-sink multiset
    "stream_sink_parquet" -> dedupIngestOracle,
    // stream == batch: the final latest per key is the batch CDC
    // merge regardless of micro-batch boundaries (monotone state)
    "stream_cdc_upsert" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |             event_type FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY us DESC, event_id DESC) AS rn FROM o)
        |SELECT user_id, us AS ts_us, event_type
        |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "stream_drift_monitor" -> driftMonitorOracle,
    "stream_media_ingest" -> mediaIngestOracle,
    // stream == batch is the funnel's contract: the oracle is the
    // batch q_funnel replay VERBATIM (one SQL string, two plans)
    "stream_funnel" -> EventQueries.oracles("q_funnel"),
    // every real (day, type) cell closes and emits (sentinel window
    // stays open and absent from events), so the replay is the exact
    // per-cell count; within_bound replays as constant TRUE — the
    // sketch guarantee is the claim under test on the Spark side
    "stream_approx_users" ->
      """SELECT (epoch_us(ts) // 86400000000) * 86400000000
        |    AS window_start_us,
        |  event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  count(*) AS n_events,
        |  CAST(1 AS INTEGER) AS within_bound
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
