package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators: the streaming forms of the
  * engine's batch event operators. The reference has no event
  * streaming at all (its LockingIO is byte-stream plumbing,
  * locking_io.py:23-80); these are the capabilities a continuous
  * ingest pipeline needs, built on watermarks + windowed state so
  * they run identically on a 1000-executor cluster: state is
  * partitioned by key, late data bounded by the watermark, output
  * append-only.
  */
object StreamOps {

  /** Tumbling-window aggregate with watermark-bounded lateness.
    * Input needs an event-time column `ts` (TimestampType). */
  def tumblingCounts(events: DataFrame, tsCol: String, window_ : String,
                     watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("n"), col("sum_value"))

  /** Sliding-window aggregate: each event lands in
    * `window_ / slide` overlapping windows (Spark expands them at the
    * source — a constant-factor row multiply, still a single
    * map-combined shuffle on the window key). */
  def slidingCounts(events: DataFrame, tsCol: String, window_ : String,
                    slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide).as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("n"), col("sum_value"))

  /** Streaming exact dedup with bounded state: drops events whose
    * key was already seen within the watermark horizon. State per key
    * is evicted once the watermark passes, so memory is bounded by
    * (keys/horizon), not the stream's lifetime — the streaming form
    * of the batch `Dedup.exact` operator. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keyCols: Seq[String], watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream inner join on a key plus a time interval: a left
    * event matches right events with the same key whose timestamp is
    * in [left.ts - before, left.ts + after]. Both sides carry
    * watermarks, so join state is evicted once an event can no
    * longer match — bounded memory on unbounded streams, the
    * streaming form of the batch range/as-of joins.
    *
    * Column contract: key columns share names; the time columns are
    * `leftTs`/`rightTs` (pre-rename on the caller side). Output =
    * left row ++ right row.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String,
                   before: String, after: String,
                   watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val keyEq = keyCols.map(k => l(k) === r(k)).reduce(_ && _)
    val cond = keyEq &&
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $after")
    keyCols.foldLeft(l.join(r, cond, "inner"))((d, k) => d.drop(r(k)))
  }

  /** Streaming per-window top-k: the batch [[graft.operators.TopK]]
    * aggregator reused as a UDAF inside a watermarked tumbling-window
    * aggregate. The bounded buffer property carries over: streaming
    * state per (window) group is at most k items, and each trigger's
    * partial aggregation forwards at most k rows per window — the
    * stream never materializes the full candidate set. Emits one row
    * per (window, rank) when the watermark closes the window.
    *
    * @param events frame with event-time `tsCol`, long `idCol`,
    *               double `scoreCol`
    */
  def windowedTopK(events: DataFrame, tsCol: String, idCol: String,
                   scoreCol: String, k: Int, window_ : String,
                   watermark: String): DataFrame = {
    val topk = udaf(new graft.operators.TopK.TopKAgg(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
    events
      .withWatermark(tsCol, watermark)
      // same contract as the batch TopK.perKey: null ids/scores drop
      // (the primitive-tuple encoder would otherwise kill the query)
      .filter(col(idCol).isNotNull && col(scoreCol).isNotNull)
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(topk(col(idCol), col(scoreCol)).as("top"))
      .select(col("w.start").as("window_start"),
        posexplode(col("top.items")).as(Seq("i", "item")))
      // same 4-dp output rounding as the batch TopK.perKey, so the
      // streaming window's top-k reconciles exactly against a batch
      // backfill of the same data
      .select(col("window_start"), col("item._1").as("id"),
        round(col("item._2"), 4).as("score"),
        (col("i") + 1).cast("long").as("rank"))
  }

  final case class Anomaly(user_id: Long, ts_us: Long, value: Double,
                           z_e2: Long)
  final case class WelfordState(n: Long, mean: Double, m2: Double)

  /** Streaming per-key anomaly detection: a Welford running
    * mean/variance per key (numerically stable, O(1) state — three
    * numbers per key, independent of stream length), flagging events
    * more than `zThreshold` sample standard deviations from the key's
    * running mean once `warmup` observations have accumulated. The
    * z-score is emitted floor-scaled e2 so downstream comparisons are
    * integer-exact.
    *
    * State is keyed and tiny, so the operator shuffles once on the
    * key and scales with the number of distinct keys, not events.
    * Within a trigger batch events fold in event-time order; the
    * statistics update AFTER scoring, so an event never tests against
    * a mean it contributed to. */
  def zscoreAnomalies(events: Dataset[SessionEvent], zThreshold: Double = 3.0,
                      warmup: Long = 10L): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[WelfordState, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, evs, state: GroupState[WelfordState]) =>
          var st = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
          val out = Seq.newBuilder[Anomaly]
          // microsecond-precision event time: getTime is ms-truncated,
          // the sub-ms part lives in getNanos — fold it back in so both
          // the ordering and the emitted ts_us are replay-deterministic
          // for sub-millisecond event streams
          def us(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          evs.toSeq.sortBy(e => (us(e.ts), e.value)).foreach { e =>
            if (st.n >= warmup) {
              val sd = math.sqrt(st.m2 / (st.n - 1).toDouble)
              if (sd > 0.0) {
                val z = (e.value - st.mean) / sd
                if (math.abs(z) > zThreshold)
                  out += Anomaly(user, us(e.ts), e.value,
                    math.floor(z * 100).toLong)
              }
            }
            val n1 = st.n + 1
            val d = e.value - st.mean
            val mean1 = st.mean + d / n1
            st = WelfordState(n1, mean1, st.m2 + d * (e.value - mean1))
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long,
                                  start_us: Long, end_us: Long)
  final case class SessionState(n: Long, startUs: Long, lastUs: Long)

  /** Session windows via per-key custom state: a session closes after
    * `gapMinutes` of event-time inactivity — either because a later
    * event for the key arrives past the gap, or because the
    * event-time timeout fires (the watermark passed the session's
    * last event + gap), which emits the final open session and
    * REMOVES the key's state. Both paths together bound the state:
    * without the timeout branch a key that goes silent would pin its
    * open session in the state store forever. Event-time (not
    * processing-time) timeouts keep the operator deterministic and
    * replayable. Shuffled once on user_id. */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30)
  : Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    val watermarked = events.toDF()
      .withWatermark("ts", s"$gapMinutes minutes").as[SessionEvent]
    watermarked.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // inactivity expiry: flush the open session, evict the key
            val out = state.getOption.toSeq.filter(_.n > 0L)
              .map(st => SessionSummary(user, st.n, st.startUs, st.lastUs))
            state.remove()
            out.iterator
          } else {
            // batch-of-events per trigger: fold events in ts order,
            // emitting summaries when a gap closes a session
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(SessionState(0L, -1L, -1L))
            val out = Seq.newBuilder[SessionSummary]
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000L
              if (st.n == 0L) st = SessionState(1L, us, us)
              else if (us - st.lastUs > gapUs) {
                out += SessionSummary(user, st.n, st.startUs, st.lastUs)
                st = SessionState(1L, us, us)
              } else st = SessionState(st.n + 1, st.startUs, us)
            }
            state.update(st)
            // evict once the watermark passes the inactivity gap (the
            // timestamp must sit above the current watermark)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1L, st.lastUs / 1000L + gapMs))
            out.result().iterator
          }
      }
  }

  /** Stream-static incremental dedup: flags streamed documents whose
    * MinHash band keys hit a PRECOMPUTED corpus band index
    * ([[graft.operators.Dedup.corpusBandIndex]], or the same rows
    * loaded from a stored table bucketed by band_key). The stream
    * side is entirely narrow — [[graft.operators.Dedup.bandKeysNarrow]]
    * computes the signature with per-row array expressions, no
    * stateful aggregation — so each micro-batch costs one equi-join
    * against the static index: the streaming form of
    * `incrementalMinhashPairs`' probe half, filtering near-dups on
    * ingest instead of in nightly batches.
    *
    * Output: one (idCol, corpus_id, band_key) row per index hit; a
    * pair sharing several bands repeats per band (distinct-ing needs
    * cross-batch state — run dropDuplicatesWithinWatermark downstream
    * when an event-time column is available, or let the downstream
    * sink dedup on (idCol, corpus_id)). */
  def dedupAgainstCorpus(docs: DataFrame, idCol: String, textCol: String,
                         corpusIndex: DataFrame,
                         numHashes: Int = 12, bands: Int = 4): DataFrame =
    graft.operators.Dedup
      .bandKeysNarrow(docs, idCol, textCol, numHashes, bands)
      .join(corpusIndex, Seq("band_key"))
      .select(col(idCol), col("corpus_id"), col("band_key"))

  /** Stream-static EMBEDDING dedup on ingest — the binary sibling of
    * [[dedupAgainstCorpus]]: each arriving vector packs into its
    * 64-bit sign signature (one narrow kernel projection — no state),
    * probes the static corpus signature index on the 16-bit band key
    * (pigeonhole: Hamming <= 3 pairs share a whole band), and the
    * exact xor+popcount filter keeps true near-dups. Index cost: 4
    * rows × ~24 B ≈ 100 bytes/corpus vector (vs the raw vector's
    * 256 B at dim 64 — and the gap widens with dim, since the index
    * size is dim-independent); one equi-join per micro-batch. Tight radii
    * only (near-exact re-crawls/mirrors — the ingest case); loose
    * angular radii belong to the LSH operators, see
    * [[graft.operators.Binary]].
    *
    * Output: one (idCol, corpus_id, dist) row per index hit; a pair
    * agreeing on several bands repeats per band (same stateless
    * contract as [[dedupAgainstCorpus]] — dedup downstream). */
  def hammingDedupAgainstCorpus(vecs: DataFrame, idCol: String,
                                vecCol: String, sigIndex: DataFrame,
                                dim: Int, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole covers Hamming <= 3")
    graft.operators.Binary.bandKeys(vecs, idCol, vecCol, dim)
      .join(sigIndex, Seq("band", "key"))
      .withColumn("dist",
        bit_count(col("sig").bitwiseXOR(col("corpus_sig"))).cast("long"))
      .filter(col("dist") <= maxHamming)
      .select(col(idCol), col("corpus_id"), col("dist"))
  }

  /** Stream-static MEDIA fingerprint dedup on ingest — the
    * perceptual sibling of [[hammingDedupAgainstCorpus]] for
    * signatures that are ALREADY packed longs (a perceptual image
    * hash, an acoustic fingerprint): each arriving signature probes
    * the static corpus index ([[graft.operators.Binary
    * .packedSignatureIndex]]) on the 16-bit band key, and the exact
    * xor+popcount filter keeps true near-dups within the pigeonhole
    * radius. Stateless — one narrow projection + one equi-join per
    * micro-batch; the corpus index is 4 rows × 24 bytes per item
    * (payload bytes never stored or streamed twice).
    *
    * Output: one (idCol, corpus_id, dist) row per index hit; a pair
    * agreeing on several bands repeats per band (same stateless
    * contract as [[dedupAgainstCorpus]] — dedup downstream). */
  def fingerprintDedupAgainstCorpus(sigs: DataFrame, idCol: String,
                                    sigCol: String, sigIndex: DataFrame,
                                    maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole covers Hamming <= 3")
    graft.operators.Binary.packedBandKeys(sigs, idCol, sigCol)
      .join(sigIndex, Seq("band", "key"))
      .withColumn("dist",
        bit_count(col(sigCol).bitwiseXOR(col("corpus_sig"))).cast("long"))
      .filter(col("dist") <= maxHamming)
      .select(col(idCol), col("corpus_id"), col("dist"))
  }

  final case class DriftEvent(ts: Timestamp, key: String)
  final case class DriftRow(window_start_us: Long, key: String,
                            ref_n: Long, cur_n: Long, contrib_e6: Long)
  final case class DriftCounts(counts: Map[String, Long])

  /** Streaming drift monitor — the continuous form of
    * [[graft.operators.Drift.jsCategorical]]: per event-time tumbling
    * window, the categorical distribution of `key` is compared
    * against a STATIC reference distribution, and one JS-divergence
    * contribution row per category is emitted when the watermark
    * closes the window. The alert a re-crawl ingest pipeline wants
    * ("this hour's language mix shifted") without waiting for the
    * nightly batch.
    *
    * Two streaming aggregations can't chain in append mode (the
    * per-window total needs the same window's per-key counts), so
    * the operator is per-window custom state: key = window start,
    * state = the category count map (bounded by the category
    * vocabulary — langs, sources, labels — not by events), finalize
    * + evict on event-time timeout. Reference counts ride the
    * closure (model-sized, the broadcast-LM pattern).
    *
    * Arithmetic is IDENTICAL to the batch operator — same add-one
    * smoothing over the union category set, same left-associated
    * `500000·p·ln(p/m)` per-half floors — so a window's emitted rows
    * equal `jsCategorical(ref, windowSlice)` exactly (pinned in
    * StreamOpsSpec). Shuffles once on the window key. */
  def windowedDriftJs(events: Dataset[DriftEvent],
                      refCounts: Map[String, Long],
                      windowMinutes: Int = 10,
                      lateMinutes: Int = 10): Dataset[DriftRow] = {
    import events.sparkSession.implicits._
    val winUs = windowMinutes * 60L * 1000000L
    val watermarked = events.toDF()
      .withWatermark("ts", s"$lateMinutes minutes").as[DriftEvent]
    watermarked
      .groupByKey(e => Math.floorDiv(e.ts.getTime * 1000L, winUs) * winUs)
      .flatMapGroupsWithState[DriftCounts, DriftRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (winStartUs, evs, state: GroupState[DriftCounts]) =>
          if (state.hasTimedOut) {
            val cur = state.getOption.map(_.counts).getOrElse(Map.empty)
            state.remove()
            // replicate jsCategorical's full-outer join + smoothing
            // over the union category set, bit for bit
            val keys = (refCounts.keySet ++ cur.keySet).toSeq.sorted
            val b = keys.size.toDouble
            val nr = refCounts.valuesIterator.sum.toDouble
            val nc = cur.valuesIterator.sum.toDouble
            keys.iterator.map { k =>
              val rn = refCounts.getOrElse(k, 0L)
              val cn = cur.getOrElse(k, 0L)
              val p = (rn + 1).toDouble / (nr + b)
              val q = (cn + 1).toDouble / (nc + b)
              val m = (p + q) / 2.0
              val contrib = math.floor(500000.0 * p * math.log(p / m)).toLong +
                math.floor(500000.0 * q * math.log(q / m)).toLong
              DriftRow(winStartUs, k, rn, cn, contrib)
            }
          } else {
            val counts = scala.collection.mutable.Map.empty[String, Long] ++=
              state.getOption.map(_.counts).getOrElse(Map.empty)
            evs.foreach(e => counts(e.key) = counts.getOrElse(e.key, 0L) + 1L)
            state.update(DriftCounts(counts.toMap))
            // finalize once the watermark passes the window end
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1L, (winStartUs + winUs) / 1000L))
            Iterator.empty
          }
      }
  }

  /** (user_id, us, event_id, event_type) — `us` is the exact
    * microsecond BIGINT (the Timestamp column only drives the
    * watermark; Timestamp.getTime is millisecond-truncated, which
    * would corrupt the (ts, event_id) strict-after comparison). */
  final case class FunnelEvent(user_id: Long, us: Long, event_id: Long,
                               event_type: String)
  final case class FunnelProgress(depth: Int, lastUs: Long, lastEid: Long,
                                  times: List[Long], lastSeenUs: Long)
  final case class FunnelRow(user_id: Long, times: Seq[Long], depth: Int)

  /** Streaming ordered-step funnel — the continuous form of
    * [[graft.operators.Funnel.funnel]]: per-user custom state chases
    * the step sequence as events arrive (step k strictly after step
    * k-1 in (us, event_id) order, the batch operator's exact
    * semantics) and emits the user's funnel row when the watermark
    * passes their last event + `quietDays` of event-time silence —
    * the conversion-report row a live product pipeline wants without
    * the nightly batch.
    *
    * `quietDays` is the CONVERSION WINDOW: a user who goes quiet
    * past it emits their journey-so-far and the state evicts, so a
    * later return starts a NEW journey row (standard funnel-window
    * product semantics — and the property that bounds the state
    * store to quiet-window-active users). Stream == batch
    * [[graft.operators.Funnel.funnel]] therefore holds exactly when
    * `quietDays` exceeds every user's largest event gap (one journey
    * per user — pinned in StreamBatchEquivalenceSpec with a window
    * longer than the log; the per-journey restart at small windows
    * is pinned there too).
    *
    * Determinism contract: the feed must deliver each user's events
    * in (us, event_id) order ACROSS micro-batches (a (us, event_id)-
    * sorted feed, or any per-user-ordered source); within a batch
    * the fold sorts. State is O(steps) per user — depth, last
    * matched (us, eid), matched times. Shuffles once on user_id.
    *
    * @param events needs `ts` (TimestampType, watermark) plus the
    *               [[FunnelEvent]] columns */
  def streamingFunnel(events: DataFrame, steps: Seq[String],
                      quietDays: Int = 1,
                      lateMinutes: Int = 10): Dataset[FunnelRow] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    val quietMs = quietDays * 86400000L
    // NOTE: the step-type filter runs BELOW the watermark collector
    // after pushdown, so filtered-out rows do NOT advance event time
    // — a watermark-driving sentinel must be a step-type row (see
    // Fixtures.streamFunnelFeed, which learned this at 23/150 users)
    val typed = events
      .withWatermark("ts", s"$lateMinutes minutes")
      .filter(col("event_type").isin(steps.map(x => x: Any): _*))
      .select(col("user_id").cast("long").as("user_id"),
        col("us").cast("long").as("us"),
        col("event_id").cast("long").as("event_id"),
        col("event_type"), col("ts"))
      .as[FunnelEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, evs, state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(st => FunnelRow(user, st.times.reverse, st.depth))
            state.remove()
            out.iterator
          } else {
            var st = state.getOption.getOrElse(
              FunnelProgress(0, Long.MinValue, Long.MinValue, Nil,
                Long.MinValue))
            evs.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
              if (e.us > st.lastSeenUs) st = st.copy(lastSeenUs = e.us)
              if (st.depth < steps.length && e.event_type == steps(st.depth) &&
                  (e.us > st.lastUs ||
                    (e.us == st.lastUs && e.event_id > st.lastEid)))
                st = FunnelProgress(st.depth + 1, e.us, e.event_id,
                  e.us :: st.times, st.lastSeenUs)
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1L,
              st.lastSeenUs / 1000L + quietMs))
            Iterator.empty
          }
      }
  }

  final case class UpsertEvent(k: Long, t: Long, tie: Long, typ: String)
  final case class UpsertRow(k: Long, t: Long, tie: Long, typ: String)

  /** UPDATE-mode stateful CDC view maintenance: per key, the state is
    * the latest (t, tie) row seen so far; every micro-batch that
    * touches a key re-emits that key's current latest (the
    * materialized-upsert-view shape — downstream sees one fresh row
    * per changed key per batch, never the whole table). State is ONE
    * row per key, bounded by keyspace; no watermark needed — a
    * latest-wins state is monotone, so late or reordered batches
    * cannot change the final answer (the stream==batch contract the
    * gate oracle checks). Delete semantics stay with the CALLER: the
    * emitted latest row carries `typ`, and the consumer drops keys
    * whose final latest is a tombstone — exactly
    * [[graft.operators.Scd.mergeLatest]]. */
  def streamingLatest(events: Dataset[UpsertEvent]): Dataset[UpsertRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.k)
      .mapGroupsWithState[UpsertRow, UpsertRow](
        GroupStateTimeout.NoTimeout()) {
        case (k, evs, state: GroupState[UpsertRow]) =>
          var best = state.getOption.getOrElse(
            UpsertRow(k, Long.MinValue, Long.MinValue, ""))
          evs.foreach { e =>
            if (e.t > best.t || (e.t == best.t && e.tie > best.tie))
              best = UpsertRow(k, e.t, e.tie, e.typ)
          }
          state.update(best)
          best
      }
  }
}
