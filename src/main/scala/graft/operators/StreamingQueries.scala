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

  /** q28: streaming dedup (batch form — the streaming path is
    * dropDuplicatesWithinWatermark, exercised by EventStreamsSpec):
    * first event per (user, type, minute) with duplicate accounting. */
  def q28StreamDedup(s: SparkSession, d: String): DataFrame =
    EventStreams.dedupByMinute(Tables.events(s, d))
      .select(col("user_id"), col("event_type"),
        date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("minute"),
        col("event_id").as("first_event_id"), col("n_in_group"))
      .orderBy("user_id", "event_type", "minute")

  val queries: Map[String, Q] = Map(
    "q17_sessions" -> q17Sessions,
    "q18_windowed_stats" -> q18WindowedStats,
    "q28_stream_dedup" -> q28StreamDedup)

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
    "q28_stream_dedup" ->
      """SELECT user_id, event_type,
        |  strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute,
        |  min(event_id) AS first_event_id, count(*) AS n_in_group
        |FROM events GROUP BY user_id, event_type, date_trunc('minute', ts)
        |ORDER BY user_id, event_type, minute""".stripMargin)
}
