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

  val queries: Map[String, Q] = Map(
    "q24_asof_join" -> q24AsofJoin,
    "q25_range_join" -> q25RangeJoin)

  // ---- DuckDB oracles ----

  val oracle: Map[String, String] = Map(
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
         |ORDER BY id_a, id_b""".stripMargin)
}
