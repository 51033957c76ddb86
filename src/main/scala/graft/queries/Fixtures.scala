package graft.queries

import java.nio.file.{Files, Paths, Path, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Nest

/** Pre-materialized nested-input fixtures for the flatten benchmarks.
  *
  * The flatten queries need genuinely nested frames as input, but
  * building them (Nest's collect_list aggregation, a join for the
  * two-level shape) costs more than the flatten being measured — and
  * that cost is shuffle-heavy and noisy, so timing it INSIDE the query
  * made the flatten trend line unreadable (±2.5x swings with identical
  * code between rounds 2 and 3). Each fixture is therefore written to
  * parquet once per scale-factor directory and read back by the timed
  * query: the benchmark then measures what the reference measures —
  * flatten over nested data at rest (pbd_tests.py:55-60 times decode +
  * flatten of an already-written file, never fixture construction).
  *
  * The cache key includes the source parquet's mtime, so regenerated
  * test data invalidates stale fixtures. Writes go to a temp dir and
  * move into place atomically, so concurrent suites never observe a
  * half-written fixture.
  */
object Fixtures {

  private def cacheRoot(dir: String): Path = {
    // key over EVERY source table the fixtures read (lineitem,
    // orders, and the stream-feed sources documents/events):
    // regenerating any invalidates the whole cache
    val mtimes = Seq("lineitem.parquet", "orders.parquet",
      "documents.parquet", "events.parquet").map { t =>
      val src = Paths.get(dir, t)
      if (Files.exists(src)) Files.getLastModifiedTime(src).toMillis else 0L
    }
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_") + "_" + mtimes.mkString("_")
    Paths.get(sys.props("java.io.tmpdir"), "graft_fixtures", key)
  }

  /** Per-JVM reusable scratch slots for queries that write through
    * the filesystem (avro/arrow/orc/csv round-trips, the streaming
    * file sink). One root per process, deleted by a shutdown hook;
    * each named slot is WIPED on re-entry — a bench/probe loop that
    * re-invokes a query reuses one directory instead of leaking a
    * fresh temp per run for the life of the machine. */
  private lazy val scratchRoot: Path = {
    val p = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit))
    p
  }

  private[queries] def scratch(name: String): Path = synchronized {
    val d = scratchRoot.resolve(name)
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
    Files.createDirectories(d)
  }

  /** Move tmp into place. ATOMIC_MOVE where the filesystem supports
    * it; a plain rename otherwise (tmp dir on a different mount). In
    * both cases losing the publish race — the target already exists,
    * surfaced as FileAlreadyExists for files or DirectoryNotEmpty
    * when rename(2) hits the winner's non-empty fixture directory —
    * just discards tmp: the winner's fixture is equivalent. Any
    * other failure propagates: deleting tmp and carrying on would
    * turn a real IO error into a confusing missing-path read later. */
  private def lostRace(e: java.nio.file.FileSystemException): Boolean =
    e.isInstanceOf[java.nio.file.FileAlreadyExistsException] ||
      e.isInstanceOf[java.nio.file.DirectoryNotEmptyException]

  private def publish(tmp: Path, path: Path): Unit =
    try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException if lostRace(e) =>
        org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        try Files.move(tmp, path)
        catch {
          case e: java.nio.file.FileSystemException if lostRace(e) =>
            org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
        }
    }

  /** Build-once-per-sf parquet cache. The _SUCCESS marker written by
    * Spark's committer inside the moved directory is the completeness
    * witness. Shared with MultimodalQueries' payload corpora: media
    * queries must time decode over payloads AT REST, not synthetic
    * payload construction, for the same reason the flatten queries
    * read nested fixtures (see the object scaladoc).
    *
    * `parallel = true` (the media corpora) repartitions BOTH sides of
    * the cache to the session's default parallelism: the build (so
    * the one-time encode uses the machine and the fixture lands as
    * many files, the at-rest shape a real corpus has) and the read
    * (so the DECODE stage — the work under test — runs one task per
    * core even over a fixture written before this round, instead of
    * inheriting the source table's single-file single-task scan; the
    * r13 verdict measured mm_audio_fp decoding serially at cpu/wall
    * ~1.0 on a 32-thread session for exactly this reason). The read-
    * side exchange moves only the payload bytes once and is orders
    * of magnitude cheaper than the codec work it parallelizes; at
    * production scale the corpus arrives as thousands of files and
    * the scan parallelizes without it — the repartition models that
    * multi-file distribution, it does not add work the real pipeline
    * lacks. Row identity is untouched, so every mm_* oracle (all
    * partitioning-independent) is unchanged. */
  private[queries] def cached(s: SparkSession, dir: String, name: String,
                              parallel: Boolean = false)
                    (build: => DataFrame): DataFrame = synchronized {
    val path = cacheRoot(dir).resolve(name)
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = cacheRoot(dir).resolve(
        s"$name.tmp-${java.lang.ProcessHandle.current().pid()}")
      val df = if (parallel) build.repartition(s.sparkContext.defaultParallelism)
               else build
      df.write.mode("overwrite").parquet(tmp.toString)
      Files.createDirectories(path.getParent)
      publish(tmp, path)
    }
    val out = s.read.parquet(path.toString)
    if (parallel) out.repartition(s.sparkContext.defaultParallelism) else out
  }

  /** One-level nested lineitem: (l_orderkey, items[(l_linenumber,
    * l_quantity)]) — input of flatten_roundtrip / flatten_outer and
    * the building block of the two-level fixture. */
  def nestedLineitem(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "nested_lineitem") { nestLineitem(s, dir) }

  /** The same frame built inline (un-cached): what nest_roundtrip
    * times. */
  def nestLineitem(s: SparkSession, dir: String): DataFrame =
    // fanned: the per-key struct-list build dominates the one-task scan
    Nest.nest(Tables.fanned(s, dir, "lineitem"),
      keys = Seq("l_orderkey"), payload = Seq("l_linenumber", "l_quantity"),
      as = "items", sortBy = Seq("l_linenumber"))

  /** Two-level nesting: customer -> orders[] -> items[]. */
  def nestedOrders2(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "nested_orders2") {
      val inner = nestLineitem(s, dir)
      Tables(s, dir, "orders")
        .join(inner, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("items"))
        .groupBy("o_custkey")
        .agg(collect_list(
          struct(col("o_orderkey"), col("o_totalprice"), col("items")))
          .as("orders"))
    }

  /** Orders left-joined to nested items: rows with null `items` are
    * the outer-join semantics probe. */
  def nestedOuter(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "nested_outer") {
      Tables(s, dir, "orders")
        .join(nestLineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), col("items"))
    }

  /** Sibling-array fixture: items[] and flags[] conflict under
    * FlattenAll; the scalar count `n` survives FlattenAvailable, the
    * include list selects items under FlattenExplicit. */
  def nestedSiblings(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "nested_siblings") {
      Tables(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_linenumber"), col("l_quantity")))
          .as("items"),
          collect_list(col("l_returnflag")).as("flags"),
          count(lit(1)).as("n"))
    }

  /** lineitem rows encoded as a PBD container once per sf — the
    * pbd_source query reads it back through the wire-level decoder,
    * which makes PBD decode measurable at benchmark scale (600 k
    * records at sf0.1) against the reference's 200 k rec/s bound
    * (pbd_tests.py:42-58). The collect here is the fixture WRITER —
    * one-time, outside any timed query. */
  def pbdLineitem(s: SparkSession, dir: String): String = synchronized {
    import graft.sources.pbd.{PbdWriter, PbdDescriptors}
    val path = cacheRoot(dir).resolve("lineitem.pbd")
    if (!Files.exists(path)) {
      Files.createDirectories(path.getParent)
      val tmp = path.resolveSibling(
        s"lineitem.pbd.tmp-${java.lang.ProcessHandle.current().pid()}")
      val rows = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
        .collect()
      val fields = Seq(
        PbdWriter.Field("l_orderkey", 1, PbdDescriptors.T.INT64),
        PbdWriter.Field("l_partkey", 2, PbdDescriptors.T.INT64),
        PbdWriter.Field("l_quantity", 3, PbdDescriptors.T.DOUBLE),
        PbdWriter.Field("l_returnflag", 4, PbdDescriptors.T.STRING))
      PbdWriter.write(tmp.toString, "graft", "LineItem", fields,
        rows.iterator.map { r => out =>
          out.writeVarintField(1, r.getLong(0))
          out.writeVarintField(2, r.getLong(1))
          out.writeDoubleField(3, r.getDouble(2))
          out.writeStringField(4, r.getString(3))
        })
      publish(tmp, path)
    }
    path.toString
  }

  /** Stream-feed fixture: one parquet FILE per micro-batch (named
    * `batch_NNNN.parquet`, modification times in batch order), the
    * layout Spark's FileStreamSource with `maxFilesPerTrigger = 1`
    * consumes as one micro-batch per file. This replaces the old
    * collect()-fed MemoryStream harness — the corpus never
    * materializes on the driver; at 100 TB the analog is files
    * landing in an ingest directory (or a Kafka topic), which is
    * exactly the source class under test. Batch files carry fixed
    * synthetic mtimes so the source's timestamp ordering is
    * deterministic across rebuilds and machines. */
  private def streamFeed(dir: String, name: String)
                        (batches: => Seq[DataFrame]): Path = synchronized {
    val path = cacheRoot(dir).resolve(name)
    if (!Files.exists(path.resolve("_FEED_READY"))) {
      val tmp = cacheRoot(dir).resolve(
        s"$name.tmp-${java.lang.ProcessHandle.current().pid()}")
      Files.createDirectories(tmp)
      batches.zipWithIndex.foreach { case (b, i) =>
        val stage = tmp.resolve(s"stage_$i")
        b.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = {
          val s = Files.list(stage)
          try s.filter(p => p.getFileName.toString.startsWith("part-") &&
              p.getFileName.toString.endsWith(".parquet"))
            .findFirst().orElseThrow()
          finally s.close()
        }
        val target = tmp.resolve(f"batch_$i%04d.parquet")
        Files.move(part, target)
        org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
        Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(
            1700000000000L + i * 60000L))
      }
      Files.writeString(tmp.resolve("_FEED_READY"), "ok")
      Files.createDirectories(path.getParent)
      publish(tmp, path)
    }
    path
  }

  /** The streamed 10% of documents (doc_id % 10 == 7) as three
    * micro-batch files — the stream_dedup_ingest feed. The operator
    * under test is stateless per batch, so the doc_id % 3 split is
    * purely a batching choice (output is batch-boundary-independent;
    * StreamBatchEquivalenceSpec pins it). */
  def streamDedupFeed(s: SparkSession, dir: String): String =
    streamFeed(dir, "stream_dedup_feed") {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .filter(col("doc_id") % 10 === 7)
      (0 until 3).map(b => docs.filter(pmod(col("doc_id"), lit(30)) === 7 + 10 * b))
    }.toString

  /** The streamed 10% of documents' STRUCTURED image payloads
    * (doc_id % 10 == 7, same split as [[streamDedupFeed]]) as three
    * micro-batch files of (doc_id, payload PNG bytes) — the
    * stream_media_ingest feed. Real binary payloads ride the file
    * stream; the probed operator is stateless per batch. */
  def streamMediaFeed(s: SparkSession, dir: String): String =
    // name carries a generator version: the fixture cache keys on
    // SOURCE mtimes only, so a generator change must rename or it
    // would silently reuse stale payloads
    streamFeed(dir, "stream_media_feed_g2") {
      val imgs = MultimodalQueries.structuredImages(s, dir)
        .filter(col("doc_id") % 10 === 7)
      (0 until 3).map(b =>
        imgs.filter(pmod(col("doc_id"), lit(30)) === 7 + 10 * b))
    }.toString

  /** The events odd half as three TS-ORDERED micro-batch files plus
    * two far-future sentinel files — the stream_drift_monitor feed.
    * ts-ordered tertiles preserve the old sorted-feed determinism
    * argument: every window's events precede the watermark that
    * closes it, so batch boundaries cannot change any window's
    * counts. The sentinels sit TWO days past the max event (see
    * StreamQueries' margin note): one advances the watermark, the
    * second reaps the event-time timeouts, while the sentinel's own
    * window stays open and unemitted. */
  def streamDriftFeed(s: SparkSession, dir: String): String =
    streamFeed(dir, "stream_drift_feed") {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val ev = Tables.events(s, dir)
        .filter(col("event_id") % 2 === 1)
        .select(timestamp_micros(expr("ts div 1000")).as("ts"),
          col("event_type").as("key"))
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      if (maxTs == null) Seq.empty
      else {
        // constant-key partition spec (non-foldable, see ccnetBuckets):
        // the global ntile is a one-time fixture build, not a query plan
        val tiled = ev.withColumn("__b", ntile(3).over(
          Window.partitionBy(length(col("key")) * 0)
            .orderBy(col("ts"), col("key"))))
        val sentinelMs = maxTs.getTime + 2L * 86400000L
        (1 to 3).map(b => tiled.filter(col("__b") === b).drop("__b")) ++
          Seq(0L, 1000L).map(off => Seq(
            (new java.sql.Timestamp(sentinelMs + off), "view"))
            .toDF("ts", "key"))
      }
    }.toString

  /** The whole event log sorted by (us, event_id) as three tertile
    * files + two far-future sentinel files — the stream_funnel feed.
    * The (us, event_id) sort (not just ts) is the funnel's
    * determinism contract: a user's events must arrive across
    * micro-batches in exactly the strict-after order the chase
    * folds, including timestamp ties broken by event_id. Sentinels
    * are REAL step-type rows for user -1 (a filtered-out type would
    * be pushed below the watermark collector and never advance event
    * time — measured: 23/150 users emitted): they move the watermark
    * past every user's last event + the harness's 45-day conversion
    * window (46 days out — the window must exceed the 30-day log so
    * every user is one journey and stream == batch q_funnel exactly;
    * a 2-day sentinel left mid-log quiet gaps emitting partial
    * journeys at sf0.001) — one to advance, one to fire the
    * event-time timeouts — while user -1's own group times out
    * beyond the final watermark and stays open, unemitted (the
    * driftMonitor sentinel-window discipline). */
  def streamFunnelFeed(s: SparkSession, dir: String): String =
    streamFeed(dir, "stream_funnel_feed_g3") {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(timestamp_micros(expr("ts div 1000")).as("ts"),
          expr("ts div 1000").as("us"),
          col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"),
          col("event_type"))
      val maxUs = ev.agg(max(col("us"))).head()
      if (maxUs.isNullAt(0)) Seq.empty
      else {
        val tiled = ev.withColumn("__b", ntile(3).over(
          Window.partitionBy(col("event_id") * 0)
            .orderBy(col("us"), col("event_id"))))
        val sentinelUs = maxUs.getLong(0) + 46L * 86400000000L
        (1 to 3).map(b => tiled.filter(col("__b") === b).drop("__b")) ++
          Seq(0L, 1000000L).map(off => Seq(
            (new java.sql.Timestamp((sentinelUs + off) / 1000L),
              sentinelUs + off, -1L, -1L, "signup"))
            .toDF("ts", "us", "event_id", "user_id", "event_type"))
      }
    }.toString

  /** Build every fixture for a scale factor (Bench calls this before
    * the timed loop so no query is charged fixture construction). */
  def warm(s: SparkSession, dir: String): Unit = {
    nestedLineitem(s, dir)
    nestedOrders2(s, dir)
    nestedOuter(s, dir)
    nestedSiblings(s, dir)
    pbdLineitem(s, dir)
    streamDedupFeed(s, dir)
    streamDriftFeed(s, dir)
    streamMediaFeed(s, dir)
    streamFunnelFeed(s, dir)
  }
}
