package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.EventStreams

/** Batch-mode projections of the streaming surface (the same transforms
  * run under readStream — see graft.streaming.EventStreams; streaming
  * execution is covered by ScalaTest with MemoryStream since the driver
  * gate is batch parquet). Oracle: gaps-and-islands SQL — the relational
  * dual of session windows. */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q17: gap-based sessionization (30-min inactivity gap) of the events
    * stream, batch form. */
  def q17Sessions(s: SparkSession, d: String): DataFrame =
    EventStreams.sessions(Tables.events(s, d), gap = "30 minutes")
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy("user_id", "session_start")

  /** q18: hourly windowed stats (the windowedStats transform, batch form). */
  def q18WindowedStats(s: SparkSession, d: String): DataFrame =
    EventStreams.windowedStats(Tables.events(s, d), windowLen = "1 hour")
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"),
        round(col("total"), 2).as("total"))
      .orderBy("window_start", "event_type")

  /** q68: sliding-window stats (the [[EventStreams.hoppingStats]] face,
    * batch form — 2-hour windows hopping hourly, so every event lands in
    * exactly two windows; the oracle materializes the two window starts
    * per event with a 2-element unnest, the row-local dual of Spark's
    * window() expansion). */
  def q68HoppingStats(s: SparkSession, d: String): DataFrame =
    EventStreams.hoppingStats(Tables.events(s, d),
        windowLen = "2 hours", slide = "1 hour")
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"),
        round(col("total"), 2).as("total"))
      .orderBy("window_start", "event_type")

  /** q28: streaming dedup (batch form — the streaming path is
    * dropDuplicatesWithinWatermark, exercised by EventStreamsSpec):
    * first event per (user, type, minute) with duplicate accounting. */
  def q28StreamDedup(s: SparkSession, d: String): DataFrame =
    EventStreams.dedupByMinute(Tables.events(s, d))
      .select(col("user_id"), col("event_type"),
        date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("minute"),
        col("event_id").as("first_event_id"), col("n_in_group"))
      .orderBy("user_id", "event_type", "minute")

  /** q38: stream-static dimension enrichment (the
    * [[EventStreams.enrichWithDim]] face, batch form — streaming
    * execution with a broadcast dim re-resolved per micro-batch is
    * covered in EventStreamsSpec). The dim is the customer table
    * restricted to custkey < 100 (a deliberately partial dim: events
    * from users 100+ exercise the dim_miss marker), and the enriched
    * stream is rolled up per (user, segment) — the join itself is the
    * stateless broadcast enrich, the rollup keeps the gate output
    * compact. */
  def q38EnrichDim(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d).where(col("c_custkey") < 100)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    EventStreams.enrichWithDim(Tables.events(s, d), dim)
      .groupBy(col("user_id"), col("c_mktsegment").as("segment"), col("dim_miss"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy("user_id")
  }

  /** q39 watchlist: a fixed set of watched users plus one id absent from
    * the stream (its estimate is whatever its cells collided into —
    * deterministic, oracle-replicated; CMS answers point queries, it
    * does not enumerate keys). */
  private[operators] val WatchList: Seq[Long] = (0L to 9L) :+ 9000L

  /** q39: per-hour-window approximate event rates for the watchlist via
    * the mergeable Count-Min sketch (the [[EventStreams.watchedUserRates]]
    * face, batch form — micro-batch counter merging through the state
    * store is covered in EventStreamsSpec). Per-window state is one d·w
    * counter buffer regardless of user cardinality; the probe is a
    * post-aggregation projection, so the watchlist can change without
    * touching state. The oracle rebuilds the identical counter tables
    * per window declaratively (the q35 machinery, windowed). */
  def q39WatchRates(s: SparkSession, d: String): DataFrame =
    EventStreams.watchedUserRates(Tables.events(s, d), WatchList, "1 hour")
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("user_id"), col("approx_events"))
      .orderBy("window_start", "user_id")

  /** q40: stream-stream interval join (the [[EventStreams.clickAfterView]]
    * face, batch form — dual-watermark streaming execution with
    * two-sided state expiry is covered in EventStreamsSpec): every
    * (click, view) pair by the same user where the view happened at or
    * up to 2 hours before the click. Timestamps are emitted as epoch
    * MICROSECONDS (BIGINT) — the events feed is µs-granular on both
    * engines, so the integer form sidesteps fraction-format pitfalls
    * entirely. */
  def q40ClickAfterView(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val joined = EventStreams.clickAfterView(
      ev.where(col("event_type") === "click"),
      ev.where(col("event_type") === "view"),
      horizon = "2 hours")
    joined.select(col("user_id"),
        unix_micros(col("c_ts")).as("c_ts_us"),
        unix_micros(col("v_ts")).as("v_ts_us"),
        col("c_value"), col("v_value"))
      .orderBy("user_id", "c_ts_us", "v_ts_us")
  }

  /** q57: stream-stream LEFT-OUTER interval join (q40's harder face —
    * the [[EventStreams.clickAfterView]] machinery with
    * `joinType=left_outer`): every click keeps a row even when no view
    * preceded it within the horizon, with NULL view columns and a
    * `matched` flag — the attribution shape that accounts
    * "conversions without an ad view" instead of silently dropping
    * them. In streaming execution the unmatched click is emitted only
    * once the view-side watermark passes its horizon (two-sided state
    * expiry; covered in EventStreamsSpec); the batch dual is the plain
    * left join the oracle runs. Epoch-µs integers; NULL v_ts_us/v_value
    * on unmatched rows hash identically in both engines. */
  def q57ClickNoView(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val joined = EventStreams.clickAfterView(
      ev.where(col("event_type") === "click"),
      ev.where(col("event_type") === "view"),
      horizon = "2 hours", joinType = "left_outer")
    joined.select(col("user_id"),
        unix_micros(col("c_ts")).as("c_ts_us"),
        unix_micros(col("v_ts")).as("v_ts_us"),
        col("c_value"), col("v_value"),
        col("v_ts").isNotNull.as("matched"))
      .orderBy("user_id", "c_ts_us", "v_ts_us")
  }

  /** q42: custom-state sessionization (the
    * [[EventStreams.sessionizeWithState]] face — flatMapGroupsWithState,
    * the `KeyValueGroupedDataset` arbitrary-state API the built-in
    * session_window cannot generalize; streaming timeout behavior is
    * covered in EventStreamsSpec). Batch semantics: only sessions CLOSED
    * by an in-batch gap are emitted — each user's final session stays in
    * (never-timed-out) state — so the relational dual is gaps-and-islands
    * minus each user's last island, which is exactly what the oracle
    * computes. */
  def q42StateSessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("value"))
      .as[EventStreams.Event]
    EventStreams.sessionizeWithState(ev, gapMs = 30L * 60 * 1000).toDF()
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy("user_id", "session_start_us")
  }

  /** q43: per-hour-window approximate distinct users via the mergeable
    * HyperLogLog aggregator (the [[EventStreams.approxDistinctUsers]]
    * face, batch form — register merging across micro-batches through
    * the state store is covered in EventStreamsSpec). Per-window state
    * is the fixed m-register buffer regardless of user cardinality; an
    * exact streaming count(DISTINCT) is unsupported by design. The
    * oracle rebuilds the per-window registers declaratively (the q34
    * machinery windowed, linear-counting correction included). */
  def q43WindowDistinct(s: SparkSession, d: String): DataFrame =
    EventStreams.approxDistinctUsers(Tables.events(s, d), "1 hour")
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("approx_users"))
      .orderBy("window_start")

  val queries: Map[String, Q] = Map(
    "q17_sessions" -> q17Sessions,
    "q18_windowed_stats" -> q18WindowedStats,
    "q28_stream_dedup" -> q28StreamDedup,
    "q38_enrich_dim" -> q38EnrichDim,
    "q39_watch_rates" -> q39WatchRates,
    "q40_click_after_view" -> q40ClickAfterView,
    "q42_state_sessions" -> q42StateSessions,
    "q43_window_distinct" -> q43WindowDistinct,
    "q57_click_no_view" -> q57ClickNoView,
    "q68_hopping_stats" -> q68HoppingStats)

  val oracle: Map[String, String] = Map(
    "q17_sessions" ->
      """WITH l AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000
        |       THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM l),
        |s AS (SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |        round(sum(value), 2) AS total_value FROM g GROUP BY user_id, sid)
        |SELECT user_id, strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
        |       n_events, total_value
        |FROM s ORDER BY user_id, session_start""".stripMargin,
    "q18_windowed_stats" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q68_hopping_stats" ->
      """WITH h AS (SELECT event_type, value,
        |    date_trunc('hour', ts) - unnest([0, 1]) * INTERVAL 1 HOUR AS ws
        |  FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM h GROUP BY ws, event_type ORDER BY 1, 2""".stripMargin,
    "q28_stream_dedup" ->
      """SELECT user_id, event_type,
        |  strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute,
        |  min(event_id) AS first_event_id, count(*) AS n_in_group
        |FROM events GROUP BY user_id, event_type, date_trunc('minute', ts)
        |ORDER BY user_id, event_type, minute""".stripMargin,
    "q38_enrich_dim" ->
      """WITH dim AS (SELECT c_custkey AS user_id, c_mktsegment FROM customer
        |  WHERE c_custkey < 100),
        |e AS (SELECT ev.user_id, dim.c_mktsegment AS segment,
        |    dim.user_id IS NULL AS dim_miss, ev.value
        |  FROM events ev LEFT JOIN dim ON ev.user_id = dim.user_id)
        |SELECT user_id, segment, dim_miss,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM e GROUP BY user_id, segment, dim_miss ORDER BY user_id""".stripMargin,
    "q40_click_after_view" ->
      """SELECT c.user_id,
        |  epoch_us(c.ts) AS c_ts_us, epoch_us(v.ts) AS v_ts_us,
        |  c.value AS c_value, v.value AS v_value
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 2 HOUR
        |ORDER BY c.user_id, c_ts_us, v_ts_us""".stripMargin,
    "q57_click_no_view" ->
      """WITH c AS (SELECT user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |v AS (SELECT user_id, ts, value FROM events
        |  WHERE event_type = 'view')
        |SELECT c.user_id,
        |  epoch_us(c.ts) AS c_ts_us, epoch_us(v.ts) AS v_ts_us,
        |  c.value AS c_value, v.value AS v_value,
        |  v.ts IS NOT NULL AS matched
        |FROM c LEFT JOIN v
        |  ON c.user_id = v.user_id
        | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 2 HOUR
        |ORDER BY c.user_id, c_ts_us, v_ts_us""".stripMargin,
    "q43_window_distinct" -> {
      import SketchQueries.{HllM, HllMaxRho, hllHashSql, HllAlphaM2Sql, HllLinearSqlList}
      s"""WITH h AS (SELECT date_trunc('hour', ts) AS w,
         |    ${hllHashSql("user_id")} AS h FROM events),
         |b AS (SELECT w, h % $HllM AS bucket, h // $HllM AS v FROM h),
         |r AS (SELECT w, bucket,
         |    max(CASE WHEN v = 0 THEN $HllMaxRho
         |        ELSE $HllMaxRho - length(bin(v)) END) AS r
         |  FROM b GROUP BY w, bucket),
         |g AS (SELECT w,
         |    sum(1.0/CAST(CAST(1 AS BIGINT) << r AS DOUBLE)) AS occ,
         |    count(*) AS nb
         |  FROM r GROUP BY w),
         |e0 AS (SELECT w, nb,
         |    $HllAlphaM2Sql/(occ + CAST($HllM - nb AS DOUBLE)) AS raw FROM g),
         |e AS (SELECT w,
         |    CASE WHEN raw <= CAST(${(2.5 * HllM).toInt} AS DOUBLE) AND nb < $HllM
         |         THEN ($HllLinearSqlList)[CAST($HllM - nb AS INT)]
         |         ELSE raw END AS est FROM e0)
         |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
         |  round(est, 4) AS approx_users
         |FROM e ORDER BY window_start""".stripMargin
    },
    "q42_state_sessions" ->
      """WITH l AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM l),
        |s AS (SELECT user_id, sid, min(ts) AS st, count(*) AS n_events,
        |        round(sum(value), 2) AS total_value FROM g GROUP BY user_id, sid),
        |mx AS (SELECT user_id, max(sid) AS last_sid FROM s GROUP BY user_id)
        |SELECT s.user_id, epoch_us(st) AS session_start_us, n_events, total_value
        |FROM s JOIN mx ON s.user_id = mx.user_id AND s.sid < mx.last_sid
        |ORDER BY s.user_id, session_start_us""".stripMargin,
    "q39_watch_rates" -> {
      import SketchQueries.{CmsA, CmsD, CmsW, cmsB}
      val p = graft.functions.Portable.P
      val rowsCte = (0 until CmsD).map(r =>
        s"SELECT $r AS r, ${CmsA(r)} AS a, ${cmsB(r)} AS b").mkString(" UNION ALL ")
      val watchCte = StreamingQueries.WatchList
        .map(u => s"SELECT CAST($u AS BIGINT) AS user_id").mkString(" UNION ALL ")
      // Plain % == the Spark side's pmod for these non-negative keys.
      val bucket = s"(((user_id % $p) * a + b) % $p) % $CmsW"
      s"""WITH rows AS ($rowsCte),
         |watch AS ($watchCte),
         |we AS (SELECT date_trunc('hour', ts) AS w, user_id FROM events),
         |pr AS (SELECT w, user_id, r, $bucket AS bucket FROM we, rows),
         |ctr AS (SELECT w, r, bucket, count(*) AS cnt
         |  FROM pr GROUP BY w, r, bucket),
         |prb AS (SELECT wins.w, watch.user_id, r, $bucket AS bucket
         |  FROM (SELECT DISTINCT w FROM we) wins, watch, rows),
         |est AS (SELECT prb.w, prb.user_id,
         |    min(coalesce(ctr.cnt, 0)) AS approx_events
         |  FROM prb LEFT JOIN ctr
         |  ON prb.w = ctr.w AND prb.r = ctr.r AND prb.bucket = ctr.bucket
         |  GROUP BY prb.w, prb.user_id)
         |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
         |  user_id, approx_events
         |FROM est ORDER BY window_start, user_id""".stripMargin
    })
}
