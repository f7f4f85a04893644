package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface of the engine (SURVEY.md §2.2: the
  * reference is strictly batch-iterative — this is additive capability).
  * All transforms are expressed once and run identically in batch and
  * streaming mode; streaming adds watermarks and state.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark for
    * late-data cutoff. Works on a batch DataFrame (window agg) or a
    * readStream source unchanged. */
  def windowedStats(events: DataFrame,
                    windowLen: String = "1 hour",
                    watermarkDelay: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))
  }

  /** Sliding (hopping) window stats — the third time-window face beside
    * tumbling ([[windowedStats]]) and session ([[sessions]]): overlapping
    * windows of `windowLen` advancing every `slide`, each event
    * contributing to windowLen/slide windows. The trend-smoothing shape
    * tumbling can't express (a 2-hour view refreshed hourly); streaming
    * state cost is the overlap factor × the tumbling equivalent —
    * bounded and CHOSEN, not data-driven. Batch and streaming identical. */
  def hoppingStats(events: DataFrame,
                   windowLen: String = "2 hours",
                   slide: String = "1 hour",
                   watermarkDelay: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    src.groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))
  }

  /** Gap-based sessionization with the built-in session_window (batch and
    * streaming; streaming requires the watermark). */
  def sessions(events: DataFrame,
               gap: String = "30 minutes",
               watermarkDelay: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
  }

  /** Streaming deduplication: one event per (user_id, event_type,
    * minute-truncated ts) key.
    *
    * Streaming mode uses `dropDuplicatesWithinWatermark` — state expires
    * with the watermark, so memory is bounded by keys-per-watermark-delay
    * (an unbounded `dropDuplicates` would grow state forever on an
    * infinite stream); the survivor is the first arrival. Batch mode
    * keeps the deterministic survivor (min event_id — which is also the
    * first arrival when ingestion is time-ordered, as the events feed
    * is) with per-key duplicate accounting. */
  def dedupByMinute(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    val keyed = events.withColumn("minute", date_trunc("minute", col("ts")))
    if (events.isStreaming)
      keyed.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")
    else
      keyed.groupBy(col("user_id"), col("event_type"), col("minute"))
        .agg(min(col("event_id")).as("event_id"),
          count(lit(1)).as("n_in_group"))
  }

  /** Tumbling-window approximate distinct users via the engine's
    * mergeable HyperLogLog `Aggregator` ([[graft.functions.Aggregators
    * .HllDistinct]], the q34 sketch) — the streaming face of the sketch
    * surface: per-window state is the fixed m-register buffer, merged
    * across micro-batches by the state store exactly like map-side
    * partials in batch, so an unbounded stream of users costs O(m) bytes
    * per open window. An exact streaming count(DISTINCT) is unsupported
    * by design (unbounded per-window state); the sketch IS the answer.
    * Batch and streaming produce identical estimates on the same data
    * (register max is order/batching independent — EventStreamsSpec). */
  def approxDistinctUsers(events: DataFrame,
                          windowLen: String = "1 hour",
                          watermarkDelay: String = "2 hours"): DataFrame = {
    val hll = udaf(new graft.functions.Aggregators.HllDistinct(
      graft.operators.SketchQueries.HllM, graft.operators.SketchQueries.HllMaxRho))
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    src.select(col("ts"),
        expr(graft.operators.SketchQueries.hllHashSql("user_id")).as("h"))
      .groupBy(window(col("ts"), windowLen))
      .agg(round(hll(col("h")), 4).as("approx_users"))
      .select(col("window.start").as("window_start"), col("approx_users"))
  }

  /** Per-window approximate event rates for a watchlist of users via the
    * mergeable Count-Min `Aggregator` ([[graft.functions.Aggregators
    * .CmsSketch]], the q35 sketch) — the streaming face of the frequency
    * sketch, beside [[approxDistinctUsers]]'s HLL: per-window state is
    * one fixed d·w counter buffer merged across micro-batches by the
    * state store, so an unbounded stream of keys costs O(d·w) bytes per
    * open window, where the exact per-(window, user) count keys state by
    * user — unbounded. The watchlist probe is a post-aggregation
    * projection (least over the d probed cells), so which users are
    * watched can change without touching the state. Batch and streaming
    * produce identical estimates on the same data (counter sums are
    * order/batching independent — EventStreamsSpec). */
  def watchedUserRates(events: DataFrame, watchlist: Seq[Long],
                       windowLen: String = "1 hour",
                       watermarkDelay: String = "2 hours"): DataFrame = {
    import graft.operators.SketchQueries.{CmsA, CmsD, CmsW, cmsB}
    val cms = udaf(new graft.functions.Aggregators.CmsSketch(
      CmsD, CmsW.toInt, CmsA, (0 until CmsD).map(cmsB)))
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    val sketched = src.groupBy(window(col("ts"), windowLen))
      .agg(cms(col("user_id")).as("counts"))
    val probes = explode(array(watchlist.map(k => lit(k)): _*))
    sketched.select(col("window.start").as("window_start"),
        probes.as("user_id"), col("counts"))
      .select(col("window_start"), col("user_id"),
        least((0 until CmsD).map { r =>
          val bucket = expr(graft.operators.SketchQueries.cmsBucketSql("user_id", r))
          // element_at is 1-based; counts is row-major d x w.
          element_at(col("counts"), (lit(r) * lit(CmsW) + bucket + 1).cast("int"))
        }: _*).as("approx_events"))
  }

  /** Stream-stream interval join: match each click to the view by the
    * same user that happened at or up to `horizon` before it. Both sides
    * are watermarked, and the join condition bounds event-time distance
    * in both directions — that pair of constraints is what lets Spark
    * expire buffered state on both sides (an unconstrained stream-stream
    * join would hold every row forever). Works identically on batch
    * DataFrames (plain equi+range join). */
  def clickAfterView(clicks: DataFrame, views: DataFrame,
                     horizon: String = "10 minutes",
                     watermarkDelay: String = "20 minutes",
                     joinType: String = "inner"): DataFrame = {
    val c0 = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("value").as("c_value"))
    val v0 = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
      col("value").as("v_value"))
    val c = if (c0.isStreaming) c0.withWatermark("c_ts", watermarkDelay) else c0
    val v = if (v0.isStreaming) v0.withWatermark("v_ts", watermarkDelay) else v0
    // left_outer works on the same state machinery: an unmatched click
    // is emitted with NULL view columns once the view-side watermark
    // passes its horizon — attribution pipelines use exactly this to
    // account "conversions without an ad view" instead of dropping them.
    c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("c_user").as("user_id"), col("c_ts"), col("v_ts"),
        col("c_value"), col("v_value"))
  }

  /** Stream-static enrichment join: attach a slowly-changing dimension
    * (user attributes, feature-store rows) to every event. The static
    * side broadcasts — re-resolved each micro-batch, so a dim refresh on
    * disk is picked up without restarting the query — and the stream
    * side needs no watermark or state at all: stream-static joins are
    * stateless by construction (each event joins the dim as-of its own
    * micro-batch). left_outer keeps events with no dim row (`dim_miss`
    * flags them), the standard skew-free enrichment shape at any scale.
    * Works identically on a batch DataFrame. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String = "user_id"): DataFrame = {
    // Explicit presence marker: deriving dim_miss from a data column
    // would misreport a matched row whose first attribute is NULL (and
    // depend on dim.columns ordering).
    val marked = dim.withColumn("__dim_present", lit(true))
    events.join(broadcast(marked), Seq(key), "left_outer")
      .withColumn("dim_miss", col("__dim_present").isNull)
      .drop("__dim_present")
  }

  // ---- custom state: flatMapGroupsWithState sessionization ----

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  /** start/last are event-time epoch MICROSECONDS: the events feed is
    * µs-granular, and millisecond state (Timestamp.getTime) would make
    * gap comparisons and same-millisecond orderings truncation-dependent
    * — the batch dual (q42) is gated against a µs-exact oracle. */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              n_events: Long, total_value: Double)

  private def tsMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * `KeyValueGroupedDataset` state API the built-in session_window can't
    * express arbitrary variants of (e.g. value-capped sessions). Emits a
    * session when the event-time gap exceeds `gapMs` within a batch, and
    * on state timeout across batches. */
  def sessionizeWithState(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, microsTs(s.start), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => tsMicros(e.ts))
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = tsMicros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  out += SessionOut(user, microsTs(s.start), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // batch mode has no watermark — getCurrentWatermarkMs throws
              if (scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(-1L) > 0)
                state.setTimeoutTimestamp((s.last + gapUs) / 1000L)
            }
            out.result().iterator
          }
      }
  }
}
