package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-ordered operators over the events table: as-of join,
  * sessionization, tumbling windows. The parquet ts column is
  * nanosecond-precision, read as epoch-nanosecond longs
  * ([[Tables.events]]); results expose epoch microseconds (BIGINT)
  * which DuckDB's `epoch_us` reproduces exactly (both floor the ns
  * fraction for post-1970 data).
  */
object EventQueries {
  import graft.operators.AsOfJoin

  private val NS_PER_US = 1000L
  private val US_PER_30MIN = 1800L * 1000000L
  private val NS_PER_HOUR = 3600L * 1000000000L
  private val US_PER_HOUR = 3600L * 1000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // as-of join: each purchase matched to the user's latest signup
    // at or before it (AsOfJoin operator: union + window, one shuffle)
    "q_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"))
      AsOfJoin.backward(purchases, signups, Seq("user_id"), "ts", "ts",
          Seq("ts" -> "signup_ts"))
        .select(col("event_id"), col("user_id"),
          expr(s"ts div $NS_PER_US").as("ts_us"),
          expr(s"signup_ts div $NS_PER_US").as("signup_ts_us"))
    }),

    // as-of join with a tolerance window (pandas merge_asof-style):
    // matches older than 24h come back null. Times convert to epoch
    // microseconds BEFORE the join so the tolerance comparison is the
    // same integer arithmetic in both engines.
    "q_asof_tol" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr(s"ts div $NS_PER_US").as("ts_us"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), expr(s"ts div $NS_PER_US").as("ts_us"))
      AsOfJoin.backward(purchases, signups, Seq("user_id"), "ts_us", "ts_us",
        Seq("ts_us" -> "signup_ts_us"), tolerance = Some(86400000000L))
    }),

    // as-of FORWARD join: each signup matched to the user's first
    // purchase at or after it (merge_asof direction='forward') —
    // time-to-convert analysis. Epoch-microsecond times so the
    // comparison is integer in both engines.
    "q_asof_fwd" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"),
          expr(s"ts div $NS_PER_US").as("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr(s"ts div $NS_PER_US").as("ts_us"))
      AsOfJoin.forward(signups, purchases, Seq("user_id"), "ts_us", "ts_us",
        Seq("ts_us" -> "purchase_ts_us"))
    }),

    // as-of NEAREST join with tolerance: each purchase matched to the
    // closest click within ±1h (merge_asof direction='nearest',
    // ties backward) — attribution to the nearest interaction
    "q_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr(s"ts div $NS_PER_US").as("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), expr(s"ts div $NS_PER_US").as("ts_us"))
      AsOfJoin.nearest(purchases, clicks, Seq("user_id"), "ts_us", "ts_us",
        Seq("ts_us" -> "click_ts_us"), tolerance = Some(US_PER_HOUR))
    }),

    // ordered-step funnel signup -> view -> click -> purchase: step k
    // strictly after step k-1 in (ts, event_id) order — one exchange
    // on user_id, doc-local step chase over the sorted event array
    "q_funnel" -> ((s, dir) => {
      graft.operators.Funnel.funnel(
          Tables.events(s, dir)
            .withColumn("us", expr(s"ts div $NS_PER_US")),
          "user_id", "us", "event_id", "event_type",
          Seq("signup", "view", "click", "purchase"))
        .withColumnsRenamed(Map(
          "t_signup" -> "t_signup_us", "t_view" -> "t_view_us",
          "t_click" -> "t_click_us", "t_purchase" -> "t_purchase_us"))
    }),

    // path analysis: the 20 most-travelled 3-step event-type paths
    // across user journeys (ts, event_id order) — the discovery pass
    // that suggests which funnels to define
    "q_event_paths" -> ((s, dir) =>
      graft.operators.Funnel.topPaths(
        Tables.events(s, dir)
          .withColumn("us", expr(s"ts div $NS_PER_US")),
        "user_id", "us", "event_id", "event_type", n = 3, k = 20)),

    // daily cohort retention triangle: cohort = day of first event,
    // cell (cohort, offset) = cohort users active offset days later.
    // Corpus collapses to distinct (user, day) pairs immediately
    "q_retention" -> ((s, dir) =>
      graft.operators.Funnel.retention(
        Tables.events(s, dir)
          .withColumn("us", expr(s"ts div $NS_PER_US")),
        "user_id", "us", periodLen = 86400000000L)),

    // RANGE-frame rolling aggregate: per event, the user's trailing
    // 24h activity (count + integer-cents sum — sliding-frame float
    // sums differ between engines' segment-tree vs linear
    // accumulation, integers don't). Peers at equal us share a frame
    // by definition, so no tiebreak is needed for determinism.
    "q_rolling" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc)
        .rangeBetween(-86400000000L + 1, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          expr(s"ts div $NS_PER_US").as("us"),
          floor(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"), col("user_id"), col("us"),
          count(lit(1)).over(w).as("n_24h"),
          sum(col("cents")).over(w).as("cents_24h"))
    }),

    // type-2 SCD build from the event log: per-user validity
    // intervals of the tracked value bucket, no-op updates collapsed
    // (Scd.scala — the dimension-history maintenance pass)
    "q_scd2" -> ((s, dir) =>
      graft.operators.Scd.scd2(
        Tables.events(s, dir)
          .select(col("user_id"), expr(s"ts div $NS_PER_US").as("us"),
            col("event_id"),
            floor(col("value") / 100).cast("long").as("bucket")),
        "user_id", "us", "event_id", "bucket")
        .withColumnsRenamed(Map(
          "valid_from" -> "valid_from_us", "valid_to" -> "valid_to_us"))),

    // CDC log compaction: latest row per user wins, 'error' rows
    // tombstone the user out of the snapshot (MERGE-style upsert)
    "q_cdc_merge" -> ((s, dir) =>
      graft.operators.Scd.mergeLatest(
        Tables.events(s, dir)
          .select(col("user_id"), expr(s"ts div $NS_PER_US").as("ts_us"),
            col("event_id"), col("event_type"), col("value"),
            (col("event_type") === "error").as("is_delete")),
        "user_id", "ts_us", "event_id", "is_delete",
        Seq("ts_us", "event_type", "value"))),

    // sessionization: 30-minute inactivity gap splits sessions
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("us", expr(s"ts div $NS_PER_US"))
        .withColumn("gap",
          when(col("us") - lag(col("us"), 1).over(w) > US_PER_30MIN ||
               lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("gap")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    // JSON function library over the string props column:
    // scalar-path extraction stays inside codegen (no DOM object
    // rides between operators)
    "q_json_funcs" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_mod10"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))),

    // tumbling hourly window: count + value sum per hour bucket
    "q_tumbling" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy((expr(s"ts div $NS_PER_HOUR") * US_PER_HOUR).as("hour_us"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))),

    // sliding windows in batch: Spark's native window() generator
    // (size 2h, slide 1h — every event lands in exactly two windows)
    "q_sliding" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("tsm", timestamp_micros(expr(s"ts div $NS_PER_US")))
        .groupBy(window(col("tsm"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(unix_micros(col("w.start")).as("win_us"),
          col("n"), col("sum_value"))),

    // exact histogram: fixed-width value buckets, all-integer keys
    "q_histogram" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_v"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))),

    // numeric drift: PSI of the value distribution between two
    // snapshot halves (event_id parity stands in for old/new crawl).
    // Per-bucket ln terms floor to micro-units before the sum, so the
    // drift statistic is an exact integer artifact (Drift.scala)
    "q_drift_psi" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Drift.psiNumeric(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1),
        "value", bucketWidth = 25.0)
    }),

    // per-group PSI: the WHICH-source-drifted alert table — same
    // smoothed micro-unit arithmetic, one summary row per event type
    "q_drift_by_group" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Drift.psiByGroup(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1),
        "event_type", "value", bucketWidth = 25.0)
    }),

    // categorical drift: Jensen-Shannon divergence of the event-type
    // mix between the same two snapshot halves
    "q_drift_js" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Drift.jsCategorical(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1),
        "event_type")
    }),

    // rank statistics: ntile / percent_rank / cume_dist over a
    // deterministic total order; ratios ship floor-scaled e4 (floor of
    // identical IEEE doubles is bit-exact where round can disagree)
    "q_rank_stats" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc, col("event_id").asc)
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          ntile(4).over(w).cast("long").as("quartile"),
          floor(percent_rank().over(w) * 10000).cast("long").as("pct_rank_e4"),
          floor(cume_dist().over(w) * 10000).cast("long").as("cume_e4"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_asof" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  (SELECT epoch_us(max(s.ts)) FROM events s
        |   WHERE s.user_id = e.user_id AND s.event_type = 'signup'
        |     AND s.ts <= e.ts) AS signup_ts_us
        |FROM events e WHERE e.event_type = 'purchase'""".stripMargin,
    "q_asof_tol" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  (SELECT max(g.ts_us) FROM g
        |   WHERE g.user_id = p.user_id AND g.ts_us <= p.ts_us
        |     AND p.ts_us - g.ts_us <= 86400000000) AS signup_ts_us
        |FROM p""".stripMargin,
    "q_asof_fwd" ->
      """WITH g AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |p AS (SELECT user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT g.event_id, g.user_id, g.ts_us,
        |  (SELECT min(p.ts_us) FROM p
        |   WHERE p.user_id = g.user_id AND p.ts_us >= g.ts_us)
        |    AS purchase_ts_us
        |FROM g""".stripMargin,
    // nearest replay: backward and forward candidates within the
    // tolerance, equidistant ties resolve to the backward candidate
    "q_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'click'),
        |m AS (SELECT p.event_id, p.user_id, p.ts_us,
        |        (SELECT max(c.ts_us) FROM c
        |         WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us
        |           AND p.ts_us - c.ts_us <= 3600000000) AS back_us,
        |        (SELECT min(c.ts_us) FROM c
        |         WHERE c.user_id = p.user_id AND c.ts_us >= p.ts_us
        |           AND c.ts_us - p.ts_us <= 3600000000) AS fwd_us
        |      FROM p)
        |SELECT event_id, user_id, ts_us,
        |  CASE WHEN back_us IS NULL THEN fwd_us
        |       WHEN fwd_us IS NULL THEN back_us
        |       WHEN ts_us - back_us <= fwd_us - ts_us THEN back_us
        |       ELSE fwd_us END AS click_ts_us
        |FROM m""".stripMargin,
    // funnel replay: chained first-strictly-after CTEs, each step the
    // (us, event_id)-lexicographic first candidate after the previous
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |           FROM events
        |           WHERE event_type IN ('signup','view','click','purchase')),
        |s1 AS (SELECT user_id, us, event_id FROM (
        |    SELECT user_id, us, event_id, row_number() OVER
        |      (PARTITION BY user_id ORDER BY us, event_id) AS rn
        |    FROM e WHERE event_type = 'signup') WHERE rn = 1),
        |s2 AS (SELECT user_id, us, event_id FROM (
        |    SELECT e.user_id, e.us, e.event_id, row_number() OVER
        |      (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
        |    FROM e JOIN s1 USING (user_id)
        |    WHERE e.event_type = 'view'
        |      AND (e.us > s1.us OR (e.us = s1.us AND e.event_id > s1.event_id)))
        |  WHERE rn = 1),
        |s3 AS (SELECT user_id, us, event_id FROM (
        |    SELECT e.user_id, e.us, e.event_id, row_number() OVER
        |      (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
        |    FROM e JOIN s2 USING (user_id)
        |    WHERE e.event_type = 'click'
        |      AND (e.us > s2.us OR (e.us = s2.us AND e.event_id > s2.event_id)))
        |  WHERE rn = 1),
        |s4 AS (SELECT user_id, us, event_id FROM (
        |    SELECT e.user_id, e.us, e.event_id, row_number() OVER
        |      (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
        |    FROM e JOIN s3 USING (user_id)
        |    WHERE e.event_type = 'purchase'
        |      AND (e.us > s3.us OR (e.us = s3.us AND e.event_id > s3.event_id)))
        |  WHERE rn = 1),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id, s1.us AS t_signup_us, s2.us AS t_view_us,
        |  s3.us AS t_click_us, s4.us AS t_purchase_us,
        |  CAST(CASE WHEN s1.us IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN s2.us IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN s3.us IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN s4.us IS NULL THEN 0 ELSE 1 END AS INTEGER) AS depth
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)""".stripMargin,
    // path replay: per-user (us, event_id)-ordered type list,
    // length-3 windows '>'-joined, corpus-wide counts, top 20 with
    // lexicographic tiebreak
    "q_event_paths" ->
      """WITH o AS (SELECT user_id, event_type,
        |             row_number() OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(ts), event_id) AS rn
        |           FROM events),
        |p AS (SELECT a.event_type || '>' || b.event_type || '>'
        |        || c.event_type AS path
        |      FROM o a JOIN o b ON a.user_id = b.user_id
        |        AND b.rn = a.rn + 1
        |      JOIN o c ON a.user_id = c.user_id AND c.rn = a.rn + 2),
        |g AS (SELECT path, count(*) AS n_paths FROM p GROUP BY 1)
        |SELECT path, CAST(n_paths AS BIGINT) AS n_paths,
        |  CAST(row_number() OVER (ORDER BY n_paths DESC, path ASC)
        |    AS BIGINT) AS rank
        |FROM g QUALIFY rank <= 20""".stripMargin,
    // retention replay: identical distinct-pair -> min-cohort ->
    // offset-count chain (// is DuckDB's integer floor divide; ts
    // values are all post-epoch so it matches BIGINT div)
    "q_retention" ->
      """WITH up AS (SELECT DISTINCT user_id,
        |              epoch_us(ts) // 86400000000 AS period
        |            FROM events),
        |c AS (SELECT user_id, min(period) AS cohort FROM up GROUP BY 1)
        |SELECT c.cohort, up.period - c.cohort AS offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM up JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_rolling" ->
      """WITH o AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |             CAST(floor(value * 100) AS BIGINT) AS cents
        |           FROM events)
        |SELECT event_id, user_id, us,
        |  count(*) OVER w AS n_24h,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_24h
        |FROM o
        |WINDOW w AS (PARTITION BY user_id ORDER BY us ASC
        |  RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW)""".stripMargin,
    // SCD2 replay: the same two ordered windows — change detection
    // (IS DISTINCT FROM the lag), then lead() over the survivors
    "q_scd2" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |             CAST(floor(value / 100) AS BIGINT) AS bucket
        |           FROM events),
        |c AS (SELECT *, lag(bucket) OVER w AS prev,
        |        row_number() OVER w AS rn
        |      FROM o
        |      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |k AS (SELECT user_id, bucket, us, event_id FROM c
        |      WHERE rn = 1 OR bucket IS DISTINCT FROM prev)
        |SELECT user_id, bucket, us AS valid_from_us,
        |  lead(us) OVER w2 AS valid_to_us,
        |  CAST(CASE WHEN lead(us) OVER w2 IS NULL THEN 1 ELSE 0 END
        |    AS INTEGER) AS is_current
        |FROM k
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin,
    "q_cdc_merge" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |             event_type, value FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY us DESC, event_id DESC) AS rn FROM o)
        |SELECT user_id, us AS ts_us, event_type, value
        |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |           OR lag(epoch_us(ts)) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC))
        |SELECT user_id, CAST(sum(gap) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "q_json_funcs" ->
      """WITH k AS (SELECT event_id,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |           FROM events)
        |SELECT k % 10 AS k_mod10, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM k GROUP BY 1""".stripMargin,
    "q_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q_sliding" ->
      """WITH x AS (SELECT unnest([
        |    (epoch_us(ts) // 3600000000) * 3600000000,
        |    (epoch_us(ts) // 3600000000) * 3600000000 - 3600000000]) AS win_us,
        |    value
        |  FROM events)
        |SELECT win_us, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM x GROUP BY win_us""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
        |  count(*) AS n, round(sum(value), 2) AS sum_v,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY 1""".stripMargin,
    "q_drift_psi" ->
      """WITH r AS (SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
        |             count(*) AS ref_n
        |           FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        |c AS (SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
        |        count(*) AS cur_n
        |      FROM events WHERE event_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT coalesce(r.bucket, c.bucket) AS bucket,
        |        coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
        |      FROM r FULL OUTER JOIN c
        |        ON r.bucket IS NOT DISTINCT FROM c.bucket),
        |t AS (SELECT sum(ref_n) AS nr, sum(cur_n) AS nc, count(*) AS b FROM j)
        |SELECT bucket, CAST(ref_n AS BIGINT) AS ref_n,
        |  CAST(cur_n AS BIGINT) AS cur_n,
        |  CAST(floor(1000000.0 *
        |    (CAST(ref_n + 1 AS DOUBLE) / CAST(nr + b AS DOUBLE) -
        |     CAST(cur_n + 1 AS DOUBLE) / CAST(nc + b AS DOUBLE)) *
        |    ln((CAST(ref_n + 1 AS DOUBLE) / CAST(nr + b AS DOUBLE)) /
        |       (CAST(cur_n + 1 AS DOUBLE) / CAST(nc + b AS DOUBLE))))
        |    AS BIGINT) AS contrib_e6
        |FROM j CROSS JOIN t""".stripMargin,
    "q_drift_by_group" ->
      """WITH r AS (SELECT event_type AS g,
        |             CAST(floor(value / 25.0) AS BIGINT) AS bucket,
        |             count(*) AS ref_n
        |           FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2),
        |c AS (SELECT event_type AS g,
        |        CAST(floor(value / 25.0) AS BIGINT) AS bucket,
        |        count(*) AS cur_n
        |      FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2),
        |j AS (SELECT coalesce(r.g, c.g) AS g,
        |        coalesce(r.bucket, c.bucket) AS bucket,
        |        coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
        |      FROM r FULL OUTER JOIN c
        |        ON r.g IS NOT DISTINCT FROM c.g
        |        AND r.bucket IS NOT DISTINCT FROM c.bucket),
        |t AS (SELECT g, sum(ref_n) AS nr, sum(cur_n) AS nc,
        |        count(*) AS b FROM j GROUP BY 1),
        |k AS (SELECT j.g,
        |        CAST(floor(1000000.0 *
        |          (CAST(ref_n + 1 AS DOUBLE) / CAST(nr + b AS DOUBLE) -
        |           CAST(cur_n + 1 AS DOUBLE) / CAST(nc + b AS DOUBLE)) *
        |          ln((CAST(ref_n + 1 AS DOUBLE) / CAST(nr + b AS DOUBLE)) /
        |             (CAST(cur_n + 1 AS DOUBLE) / CAST(nc + b AS DOUBLE))))
        |          AS BIGINT) AS contrib_e6
        |      FROM j JOIN t ON t.g IS NOT DISTINCT FROM j.g)
        |SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(contrib_e6) AS BIGINT) AS psi_e6
        |FROM k GROUP BY g""".stripMargin,
    "q_drift_js" ->
      """WITH r AS (SELECT event_type AS key, count(*) AS ref_n
        |           FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        |c AS (SELECT event_type AS key, count(*) AS cur_n
        |      FROM events WHERE event_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT coalesce(r.key, c.key) AS key,
        |        coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
        |      FROM r FULL OUTER JOIN c
        |        ON r.key IS NOT DISTINCT FROM c.key),
        |t AS (SELECT sum(ref_n) AS nr, sum(cur_n) AS nc, count(*) AS b FROM j),
        |s AS (SELECT key, ref_n, cur_n,
        |        CAST(ref_n + 1 AS DOUBLE) / CAST(nr + b AS DOUBLE) AS p,
        |        CAST(cur_n + 1 AS DOUBLE) / CAST(nc + b AS DOUBLE) AS q
        |      FROM j CROSS JOIN t)
        |SELECT key, CAST(ref_n AS BIGINT) AS ref_n,
        |  CAST(cur_n AS BIGINT) AS cur_n,
        |  CAST(floor(500000.0 * p * ln(p / ((p + q) / 2.0))) +
        |       floor(500000.0 * q * ln(q / ((p + q) / 2.0)))
        |    AS BIGINT) AS contrib_e6
        |FROM s""".stripMargin,
    "q_rank_stats" ->
      """SELECT event_id, event_type,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(floor(percent_rank() OVER w * 10000) AS BIGINT) AS pct_rank_e4,
        |  CAST(floor(cume_dist() OVER w * 10000) AS BIGINT) AS cume_e4
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)""".stripMargin
  )
}
