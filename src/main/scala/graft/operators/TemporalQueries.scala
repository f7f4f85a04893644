package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Temporal join operators over the `events` table — the two non-equi
  * join shapes a training-data/feature pipeline needs that naive SQL
  * executes as a quadratic theta-join:
  *
  *  - q24 as-of join: each left row picks the latest right row at or
  *    before its timestamp. The scale formulation is union + running
  *    `last(..., ignoreNulls)` window — ONE shuffle on (user_id), no
  *    range-join explosion, no per-row probe; this is how you as-of join
  *    two 10 TB streams.
  *  - q25 range join: all same-key pairs within a bounded time gap. The
  *    scale formulation buckets time into gap-sized cells and equi-joins
  *    on (key, cell) with the left side exploded to its own + next cell —
  *    candidate volume is O(true pairs), and the equi-join shuffles by a
  *    high-cardinality composite key instead of cross-joining per user.
  *    (AQE handles residual per-user skew.)
  *
  * Determinism: (ts, event_id) is a total order; gaps are exact integer
  * microseconds; no float aggregation anywhere.
  */
object TemporalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Range-join gap: 30 minutes, in microseconds. */
  private val GapUs = 1800L * 1000000L

  /** Exact epoch-day: FLOOR division of `unix_micros(ts)` by 86400e6.
    * Spark's `DIV` truncates toward zero while DuckDB's `//` floors, so
    * for any pre-1970 timestamp a bare DIV is one day high (the q67
    * negative-division divergence class, ADVICE r7). `pmod` is
    * non-negative, so `(x − pmod(x, b)) DIV b` is floor division in
    * exact integer arithmetic — no double rounding at µs magnitudes. */
  private def epochDay: org.apache.spark.sql.Column =
    expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) DIV 86400000000")

  /** q24: as-of join clicks → latest view at-or-before, per user. */
  def q24AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .where(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(
        col("event_id"), col("user_id"), col("event_type"),
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true)
          .over(w).as("prior_view_id"),
        last(when(col("event_type") === "view", col("value")), ignoreNulls = true)
          .over(w).as("prior_view_value"))
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("prior_view_id"), col("prior_view_value"))
      .orderBy("click_id")
  }

  /** q25: same-user event pairs within 30 minutes (bucketed range join). */
  def q25RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    // Left side covers its own and the next gap-cell: a pair with
    // 0 < us_b - us_a <= GapUs has cell_b ∈ {cell_a, cell_a + 1}, so the
    // equi-join finds it exactly once (no post-join dedup needed).
    val a = ev.select(col("user_id"), col("event_id").as("id_a"), col("us").as("us_a"),
      explode(array(expr(s"us DIV $GapUs"), expr(s"us DIV $GapUs + 1"))).as("cell"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"), col("us").as("us_b"),
      expr(s"us DIV $GapUs").as("cell"))
    a.join(b, Seq("user_id", "cell"))
      .where(col("us_a") < col("us_b") && col("us_b") - col("us_a") <= GapUs)
      .select(col("user_id"), col("id_a"), col("id_b"),
        (col("us_b") - col("us_a")).as("gap_us"))
      .orderBy("id_a", "id_b")
  }

  /** q37: time-series resampling with gap fill — the densification step
    * before any ML-on-metrics or feature-store export: aggregate events
    * to an hourly grid per type, GENERATE the missing hours (an outer
    * time spine), and forward-fill the last observed total across gaps.
    *
    * Scale shape: the hourly aggregate is one map-combinable shuffle; the
    * spine is sequence+explode from each type's (min, max) hour — O(span)
    * rows generated distributed, never a driver loop; the fill is one
    * running `last(ignoreNulls)` window per type over the already-grouped
    * grid (hours, not raw events). Determinism: totals accumulate in
    * integer cents; the grid timestamp is formatted to a string (engine
    * timestamp reprs differ); gaps are exact by construction. */
  def q37GapFill(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("total_cents"))
    val spine = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hr"))
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hr"), "left_outer")
      .select(col("event_type"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total_cents"), lit(0L)).as("total_cents"),
        coalesce(last(col("total_cents"), ignoreNulls = true).over(w), lit(0L))
          .as("filled_cents"),
        col("n_events").isNull.as("is_gap"))
      .orderBy("event_type", "hour_ts")
  }

  /** q41: sequential conversion funnel (view → click → purchase) — the
    * temporal pattern-matching class (MATCH_RECOGNIZE's most common
    * real-world instance), expressed as staged min-aggregates: first
    * view per user, first click at-or-after that view, first purchase
    * at-or-after that click. Each stage is one filtered per-user
    * aggregate plus one user-keyed equi-join against the previous
    * stage's (tiny, one-row-per-user) frame — no window over the event
    * stream, no inequality join wider than the stage boundary, so the
    * plan is three map-combinable aggregates and two broadcast-size
    * joins at any corpus scale. Epoch-µs integers for timestamps (the
    * q40 convention). */
  def q41Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("vt"))
    val c = ev.where(col("event_type") === "click").join(v, "user_id")
      .where(col("ts") >= col("vt"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ct"))
    val p = ev.where(col("event_type") === "purchase").join(c, "user_id")
      .where(col("ts") >= col("ct"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("pt"))
    v.join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select(col("user_id"),
        unix_micros(col("vt")).as("first_view_us"),
        unix_micros(col("ct")).as("first_click_us"),
        unix_micros(col("pt")).as("first_purchase_us"),
        col("ct").isNotNull.as("reached_click"),
        col("pt").isNotNull.as("reached_purchase"))
      .orderBy("user_id")
  }

  /** q49: MATCH_RECOGNIZE-style sequence matching — q41's
    * generalization from one fixed funnel to an arbitrary regex over
    * each user's event-type sequence. Every event projects to a
    * one-char symbol (the five event types have distinct initials);
    * per user the symbols concatenate in (ts, event_id) order, and the
    * pattern `vc+p` (view, one-or-more clicks, purchase — a funnel
    * with retries) is matched non-overlapping left-to-right, which is
    * exactly MATCH_RECOGNIZE's AFTER MATCH SKIP PAST LAST ROW. The
    * alternation-free pattern makes Java-regex and RE2 semantics
    * coincide, so the oracle's regexp_extract_all agrees byte-for-byte.
    *
    * Scale shape: one groupBy-user shuffle carrying (µs, id, sym)
    * structs; the sort and the regex run per user row (state bounded by
    * a user's own event count — the same bound any MATCH_RECOGNIZE
    * engine needs), then everything is a per-row projection. */
  def q49SeqMatch(s: SparkSession, d: String): DataFrame = {
    val seq = Tables.events(s, d)
      .select(col("user_id"), struct(unix_micros(col("ts")).as("us"),
        col("event_id").as("eid"),
        substring(col("event_type"), 1, 1).as("sym")).as("t"))
      .groupBy("user_id")
      .agg(array_join(transform(array_sort(collect_list(col("t"))),
        x => x.getField("sym")), "").as("str"))
    seq.withColumn("matches", expr("regexp_extract_all(str, 'vc+p', 0)"))
      .select(col("user_id"),
        length(col("str")).cast("long").as("n_events"),
        size(col("matches")).cast("long").as("n_matches"),
        coalesce(try_element_at(col("matches"), lit(1)), lit("")).as("first_match"),
        coalesce(array_max(transform(col("matches"), x => length(x))), lit(0))
          .cast("long").as("max_match_len"))
      .orderBy("user_id")
  }

  /** q48: SCD2 validity intervals — turn a per-user change stream into a
    * slowly-changing-dimension history table: each event opens an
    * interval [ts, next event's ts) and the last one stays open
    * (is_current). The standard dimension-history build every warehouse
    * pipeline runs; its output is exactly what the q24 as-of join
    * consumes. One lead() window per user on the unique (ts, event_id)
    * order — a single shuffle on user_id, and at scale the window state
    * is one row (lead 1). Epoch-µs integers end-to-end (the q40
    * convention: no timestamp formatting pitfalls), value in cents. */
  def q48Scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("valid_from_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("valid_from_us"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"),
        (col("valid_to_us") - col("valid_from_us")).as("dur_us"),
        col("valid_to_us").isNull.as("is_current"),
        col("value_cents"))
      .orderBy("user_id", "valid_from_us", "event_id")
  }

  /** q56: peak interval concurrency (the sweep-line / "max concurrent
    * sessions" face) — each event opens a [[GapUs]]-long activity
    * interval; per event_type, find the maximum number of simultaneously
    * open intervals and the earliest instant it is reached. The quadratic
    * formulation is interval-overlap self-join; the scale formulation is
    * the boundary sweep: ±1 points at open/close, pre-aggregated to a
    * NET delta per (type, instant) — end-exclusive semantics fall out of
    * the netting for free — then ONE running-sum window over instants
    * (already grouped: the window input is O(distinct instants), not
    * O(events)). The peak extraction is a `max(struct)` hash aggregate,
    * not a second window. The single-partition-per-type window is
    * bounded by event_type's tiny cardinality here; the general-key
    * form is the two-pass range-partitioned prefix sum (documented, not
    * needed). Epoch-µs integers end-to-end. */
  /** The q56 sweep kernel over an interval frame `(key, st, en)`:
    * per-key peak concurrency + earliest instant it is reached.
    * End-exclusive semantics via the per-instant net delta. */
  private[operators] def overlapPeak(iv: DataFrame): DataFrame = {
    val pts = iv.select(col("key"), col("st").as("us"), lit(1L).as("delta"))
      .union(iv.select(col("key"), col("en").as("us"), lit(-1L).as("delta")))
      .groupBy("key", "us").agg(sum(col("delta")).as("net"))
    val w = Window.partitionBy("key").orderBy("us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("cum", sum(col("net")).over(w))
      .groupBy("key")
      .agg(max(struct(col("cum"), (-col("us")).as("nus"))).as("am"))
      .select(col("key"), col("am.cum").as("peak_concurrent"),
        (-col("am.nus")).as("peak_at_us"))
  }

  def q56OverlapPeak(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d)
      .select(col("event_type").as("key"), unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + GapUs).as("en"))
    overlapPeak(iv)
      .select(col("key").as("event_type"), col("peak_concurrent"),
        col("peak_at_us"))
      .orderBy("event_type")
  }

  /** q58: overlapping-interval coalescing — each event opens a
    * VALUE-DEPENDENT interval (duration = value in cents × 0.6 s, so
    * durations span seconds to ~100 minutes and long intervals
    * genuinely bridge gaps that q17's fixed point-gap sessionization
    * would split); per user, overlapping-or-touching intervals merge
    * into maximal covered spans. The islands formulation: a new span
    * starts exactly where the running max of PRIOR interval ends falls
    * short of the current start — one window pass over (user, start
    * order), island id = running sum of the break flag, then one
    * aggregate per island. Never an interval self-join. All-integer
    * µs arithmetic (durations from exact cents, the q48 convention);
    * same-start ties are island-order-invariant by construction. */
  /** The q58 islands kernel over an interval frame `(key, seq, st,
    * en)` (`seq` = the intra-key ordering tiebreak): maximal covered
    * spans per key via the running-max break pass. */
  private[operators] def mergeIntervals(iv: DataFrame): DataFrame = {
    val ord = Window.partitionBy("key").orderBy(col("st"), col("seq"))
    val prevMax = max(col("en")).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = iv.withColumn("brk",
      when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
    val sid = sum(col("brk")).over(
      ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    flagged.withColumn("sid", sid)
      .groupBy(col("key"), col("sid"))
      .agg(min(col("st")).as("span_start_us"), max(col("en")).as("span_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("key"), col("span_start_us"), col("span_end_us"),
        (col("span_end_us") - col("span_start_us")).as("span_us"),
        col("n_events"))
  }

  def q58IntervalMerge(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d).select(col("user_id").as("key"),
      col("event_id").as("seq"),
      unix_micros(col("ts")).as("st"),
      (unix_micros(col("ts")) +
        round(col("value") * 100).cast("long") * 600000L).as("en"))
    mergeIntervals(iv)
      .select(col("key").as("user_id"), col("span_start_us"),
        col("span_end_us"), col("span_us"), col("n_events"))
      .orderBy("user_id", "span_start_us")
  }

  /** q59: cohort retention matrix — users grouped by first-seen DAY
    * (the cohort), then per (cohort, day-offset) the count of distinct
    * cohort members active that day, plus retention in integer ppm of
    * the cohort size. The canonical product-analytics rollup; the scale
    * shape is two map-combinable aggregates (per-user first-seen, then
    * the distinct (user, day) activity set — already keyed by user from
    * the first shuffle) and a final count per (cohort, offset) — no
    * window over raw events, no self-join. Day arithmetic in exact
    * epoch-day integers ([[epochDay]] — the events span days, so
    * day granularity gives a real matrix where weeks would collapse). */
  def q59CohortRetention(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      .select(col("user_id"), epochDay.as("day"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = first.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    act.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("cohort_size"),
        col("n_active"),
        expr("(1000000 * n_active) DIV cohort_size").as("retention_ppm"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q64: cumulative reach / growth accounting — per epoch-day: distinct
    * active users, first-time (new) users, and the running total of
    * users ever seen. The DAU-vs-cumulative-reach report every event
    * pipeline ends with, and the q59 cohort matrix's marginal: new_users
    * is exactly q59's day-0 cohort size.
    *
    * Scale shape: one distinct over (user, day) — the q59 derivation —
    * then a min-aggregate per user for first-seen and two day-keyed
    * counts; the running sum is a window over the DAY dimension (rows =
    * days observed, bounded at any event volume), never over raw
    * events. Epoch-day integers end-to-end ([[epochDay]]). */
  def q64CumulativeUsers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val act = Tables.events(s, d)
      .select(col("user_id"), epochDay.as("day"))
      .distinct()
    val daily = act.groupBy(col("day")).agg(count(lit(1)).as("active_users"))
    val firsts = act.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(firsts, Seq("day"), "left_outer")
      .select(col("day"), col("active_users"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy("day")
  }

  /** q66: event-transition matrix — per-user consecutive event-type
    * pairs counted into the (from, to) Markov transition table with
    * exact row-normalized probabilities: the "common user journeys"
    * report behind q41's fixed funnel (the funnel asks one path; this
    * reports all single-step paths and their likelihood).
    *
    * Scale shape: one lead() window PER USER ordered by (ts, event_id)
    * — per-user event counts are bounded, never a corpus-wide window —
    * then a map-combinable (from, to) count; the probability share
    * windows over the event-type² cell frame (the t12 confusion-matrix
    * pattern), which is dimension-sized at any event volume. */
  def q66EventTransitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tr = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
    tr.groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("from_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(1000000 * n) DIV from_total").as("p_ppm"))
      .orderBy("from_type", "to_type")
  }

  val queries: Map[String, Q] = Map(
    "q64_cumulative_users" -> q64CumulativeUsers,
    "q66_event_transitions" -> q66EventTransitions,
    "q24_asof_join" -> q24AsofJoin,
    "q25_range_join" -> q25RangeJoin,
    "q37_gap_fill" -> q37GapFill,
    "q41_funnel" -> q41Funnel,
    "q48_scd2" -> q48Scd2,
    "q49_seq_match" -> q49SeqMatch,
    "q56_overlap_peak" -> q56OverlapPeak,
    "q58_interval_merge" -> q58IntervalMerge,
    "q59_cohort_retention" -> q59CohortRetention)

  // ---- DuckDB oracles ----

  val oracle: Map[String, String] = Map(
    "q66_event_transitions" ->
      """WITH e AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, next_type AS to_type,
        |    count(*) AS n
        |  FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  (1000000 * CAST(n AS BIGINT))
        |    // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS p_ppm
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q64_cumulative_users" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |daily AS (SELECT day, count(*) AS active_users FROM act
        |  GROUP BY day),
        |fs AS (SELECT min(day) AS day FROM act GROUP BY user_id),
        |nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY day)
        |SELECT d.day, CAST(active_users AS BIGINT) AS active_users,
        |  CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM daily d LEFT JOIN nu ON d.day = nu.day
        |ORDER BY d.day""".stripMargin,
    "q24_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type, value FROM events
        |           WHERE event_type IN ('click', 'view')),
        |r AS (SELECT event_id, user_id, event_type,
        |  last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
        |    OVER w AS prior_view_id,
        |  last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |    OVER w AS prior_view_value
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS click_id, user_id, prior_view_id, prior_view_value
        |FROM r WHERE event_type = 'click' ORDER BY click_id""".stripMargin,
    "q25_range_join" ->
      s"""SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
         |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
         |FROM events a JOIN events b
         |ON a.user_id = b.user_id AND epoch_us(a.ts) < epoch_us(b.ts)
         |   AND epoch_us(b.ts) - epoch_us(a.ts) <= $GapUs
         |ORDER BY id_a, id_b""".stripMargin,
    "q37_gap_fill" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr,
        |    count(*) AS n_events,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
        |bounds AS (SELECT event_type, date_trunc('hour', min(ts)) AS h0,
        |    date_trunc('hour', max(ts)) AS h1 FROM events GROUP BY event_type),
        |spine AS (SELECT event_type,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr FROM bounds),
        |grid AS (SELECT s.event_type, s.hr, n_events, total_cents
        |  FROM spine s LEFT JOIN hourly h
        |  ON s.event_type = h.event_type AND s.hr = h.hr)
        |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour_ts,
        |  coalesce(n_events, 0) AS n_events,
        |  coalesce(total_cents, 0) AS total_cents,
        |  coalesce(last_value(total_cents IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS filled_cents,
        |  n_events IS NULL AS is_gap
        |FROM grid ORDER BY event_type, hour_ts""".stripMargin,
    "q48_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS valid_from_us,
        |    CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events),
        |i AS (SELECT *, lead(valid_from_us, 1) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, event_id) AS valid_to_us FROM e)
        |SELECT user_id, event_id, event_type, valid_from_us, valid_to_us,
        |  valid_to_us - valid_from_us AS dur_us,
        |  valid_to_us IS NULL AS is_current, value_cents
        |FROM i ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    "q49_seq_match" ->
      """WITH seq AS (SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS str
        |  FROM events GROUP BY user_id),
        |m AS (SELECT user_id, str,
        |    regexp_extract_all(str, 'vc+p') AS matches FROM seq)
        |SELECT user_id, CAST(length(str) AS BIGINT) AS n_events,
        |  CAST(len(matches) AS BIGINT) AS n_matches,
        |  coalesce(matches[1], '') AS first_match,
        |  CAST(coalesce(list_max(list_transform(matches, x -> length(x))), 0)
        |    AS BIGINT) AS max_match_len
        |FROM m ORDER BY user_id""".stripMargin,
    "q56_overlap_peak" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
         |pts AS (SELECT event_type, us, CAST(sum(delta) AS BIGINT) AS net
         |  FROM (SELECT event_type, us, 1 AS delta FROM ev
         |        UNION ALL SELECT event_type, us + $GapUs, -1 FROM ev)
         |  GROUP BY event_type, us),
         |cums AS (SELECT event_type, us,
         |    CAST(sum(net) OVER (PARTITION BY event_type ORDER BY us
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum
         |  FROM pts),
         |mx AS (SELECT event_type, max(cum) AS peak FROM cums
         |  GROUP BY event_type)
         |SELECT c.event_type, m.peak AS peak_concurrent,
         |  min(c.us) AS peak_at_us
         |FROM cums c JOIN mx m
         |  ON c.event_type = m.event_type AND c.cum = m.peak
         |GROUP BY c.event_type, m.peak ORDER BY c.event_type""".stripMargin,
    "q59_cohort_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |first AS (SELECT user_id, min(day) AS cohort_day FROM act
        |  GROUP BY user_id),
        |sizes AS (SELECT cohort_day, count(*) AS cohort_size FROM first
        |  GROUP BY cohort_day),
        |m AS (SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
        |    count(*) AS n_active
        |  FROM act a JOIN first f ON a.user_id = f.user_id
        |  GROUP BY f.cohort_day, a.day - f.cohort_day)
        |SELECT m.cohort_day AS cohort_day, day_offset,
        |  CAST(cohort_size AS BIGINT) AS cohort_size,
        |  CAST(n_active AS BIGINT) AS n_active,
        |  (1000000 * CAST(n_active AS BIGINT)) // cohort_size
        |    AS retention_ppm
        |FROM m JOIN sizes ON m.cohort_day = sizes.cohort_day
        |ORDER BY m.cohort_day, day_offset""".stripMargin,
    "q58_interval_merge" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 600000 AS en
        |  FROM events),
        |f AS (SELECT user_id, st, en,
        |    CASE WHEN max(en) OVER (PARTITION BY user_id
        |        ORDER BY st, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR st > max(en) OVER (PARTITION BY user_id
        |        ORDER BY st, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS brk,
        |    event_id
        |  FROM iv),
        |g AS (SELECT user_id, st, en,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id, min(st) AS span_start_us, max(en) AS span_end_us,
        |  max(en) - min(st) AS span_us, count(*) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, span_start_us""".stripMargin,
    "q41_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS vt FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e JOIN v
        |  ON e.user_id = v.user_id AND e.ts >= v.vt
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e JOIN c
        |  ON e.user_id = c.user_id AND e.ts >= c.ct
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT v.user_id,
        |  epoch_us(vt) AS first_view_us,
        |  epoch_us(ct) AS first_click_us,
        |  epoch_us(pt) AS first_purchase_us,
        |  ct IS NOT NULL AS reached_click,
        |  pt IS NOT NULL AS reached_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin)
}
