package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class EventStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("windowedStats over a MemoryStream: counts land in their hour window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedStats(df, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      mem.addData((ts(10), "click", 1.0), (ts(20), "click", 2.0), (ts(70), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("event_type", "n", "total").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows === Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("hoppingStats over a MemoryStream: each event lands in len/slide windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hoppingStats(df, "2 hours", "1 hour", "2 hours")
      .writeStream.format("memory").queryName("hop_out")
      .outputMode("complete").start()
    try {
      // minute 70 sits in windows [0h,2h) and [1h,3h); minute 10 in
      // [-1h,1h) and [0h,2h) — the [0h,2h) window sees both events.
      mem.addData((ts(10), "click", 1.0), (ts(70), "click", 2.0))
      q.processAllAvailable()
      val rows = spark.table("hop_out")
        .select(col("window_start"), col("n"), col("total")).collect()
        .map(r => (r.getTimestamp(0).getTime / 60000L, r.getLong(1), r.getDouble(2))).toSet
      assert(rows === Set((-60L, 1L, 1.0), (0L, 2L, 3.0), (60L, 1L, 2.0)))
      // batch dual on the same rows is identical
      val batch = EventStreams.hoppingStats(
        Seq((ts(10), "click", 1.0), (ts(70), "click", 2.0))
          .toDF("ts", "event_type", "value"), "2 hours", "1 hour")
        .select(col("window_start"), col("n"), col("total")).collect()
        .map(r => (r.getTimestamp(0).getTime / 60000L, r.getLong(1), r.getDouble(2))).toSet
      assert(batch === rows)
    } finally q.stop()
  }

  test("sessions (session_window) over a MemoryStream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "value")
    val q = EventStreams.sessions(df, "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      // user 7: events at minute 0, 10 (one session), 100 (new session)
      mem.addData((ts(0), 7L, 1.0), (ts(10), 7L, 2.0), (ts(100), 7L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "n_events", "total_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows === Set((7L, 2L, 3.0), (7L, 1L, 4.0)))
    } finally q.stop()
  }

  test("approxDistinctUsers: streaming HLL across micro-batches == batch on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = EventStreams.approxDistinctUsers(df, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("complete").start()
    val batchRows = try {
      // window 1: users 1,2,3 (3 distinct, user 1 twice, split over batches);
      // window 2: users 1,4 — register merging spans micro-batches
      mem.addData((ts(5), 1L), (ts(10), 2L))
      q.processAllAvailable()
      mem.addData((ts(15), 1L), (ts(20), 3L), (ts(70), 1L), (ts(80), 4L))
      q.processAllAvailable()
      spark.table("hll_out").collect()
        .map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    } finally q.stop()
    val batch = EventStreams.approxDistinctUsers(
      Seq((ts(5), 1L), (ts(10), 2L), (ts(15), 1L), (ts(20), 3L),
        (ts(70), 1L), (ts(80), 4L)).toDF("ts", "user_id"), "1 hour")
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    assert(batchRows === batch)
    // Two windows; with the linear-counting small-range correction the
    // estimates are tight even at tiny cardinalities (window 1: 3
    // distinct users, window 2: 2).
    assert(batchRows.size === 2)
    val ests = batchRows.toSeq.sortBy(_._1.getTime).map(_._2)
    assert(math.abs(ests.head - 3.0) < 0.5, s"window-1 estimate ${ests.head} far from 3")
    assert(math.abs(ests(1) - 2.0) < 0.5, s"window-2 estimate ${ests(1)} far from 2")
  }

  test("watchedUserRates: streaming CMS across micro-batches == batch, >= exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val watch = Seq(1L, 2L, 99L) // 99 never occurs: estimate may be >0 (collision) but is whatever batch says
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = EventStreams.watchedUserRates(df, watch, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    val streamed = try {
      // window 1: user 1 x3 (split over micro-batches), user 2 x1;
      // counter merging spans batches via the state store
      mem.addData((ts(5), 1L), (ts(10), 2L))
      q.processAllAvailable()
      mem.addData((ts(15), 1L), (ts(20), 1L), (ts(70), 2L))
      q.processAllAvailable()
      spark.table("cms_out").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
    } finally q.stop()
    val data = Seq((ts(5), 1L), (ts(10), 2L), (ts(15), 1L), (ts(20), 1L), (ts(70), 2L))
    val batch = EventStreams.watchedUserRates(
        data.toDF("ts", "user_id"), watch, "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    // CMS never undercounts: window-1 user 1 has 3 events, user 2 has 1.
    val w1 = streamed.keys.map(_._1).min
    assert(streamed((w1, 1L)) >= 3L)
    assert(streamed((w1, 2L)) >= 1L)
  }

  test("watchedUserRates: negative keys probe the cell the sketch incremented") {
    import spark.implicits._
    // A truncating % in the probe bucket read a DIFFERENT cell than the
    // UDAF's floorMod increment for negative keys — pmod congruence fixes
    // it; never-undercount must hold on the full Long domain.
    val negUser = -987654321098765L
    val data = Seq((ts(5), negUser), (ts(10), negUser), (ts(15), -7L), (ts(20), 3L))
    val out = EventStreams.watchedUserRates(
        data.toDF("ts", "user_id"), Seq(negUser, -7L, 3L), "1 hour")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(negUser) >= 2L, s"CMS undercounted negative key: $out")
    assert(out(-7L) >= 1L)
    assert(out(3L) >= 1L)
  }

  test("enrichWithDim: matched dim row with NULL first attribute is not a miss") {
    import spark.implicits._
    // dim_miss must come from the join marker, not from a data column:
    // user 1's only dim attribute is legitimately NULL.
    val dim = Seq((1L, Option.empty[String]), (2L, Some("silver")))
      .toDF("user_id", "tier")
    val out = EventStreams.enrichWithDim(
        Seq((ts(5), 1L, 1.0), (ts(10), 9L, 2.0)).toDF("ts", "user_id", "value"), dim)
      .select("user_id", "dim_miss").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> false, 9L -> true))
  }

  test("enrichWithDim: stream-static join == batch join, misses flagged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "value")
    val q = EventStreams.enrichWithDim(df, dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    val streamed = try {
      mem.addData((ts(5), 1L, 1.0), (ts(10), 2L, 2.0), (ts(15), 9L, 3.0))
      q.processAllAvailable()
      spark.table("enrich_out")
        .select("user_id", "tier", "dim_miss").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2))).toSet
    } finally q.stop()
    assert(streamed === Set((1L, Some("gold"), false),
      (2L, Some("silver"), false), (9L, None, true)))
    val batch = EventStreams.enrichWithDim(
        Seq((ts(5), 1L, 1.0), (ts(10), 2L, 2.0), (ts(15), 9L, 3.0))
          .toDF("ts", "user_id", "value"), dim)
      .select("user_id", "tier", "dim_miss").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2))).toSet
    assert(batch === streamed)
  }

  test("sessionizeWithState: in-batch gap splitting matches expectations") {
    import spark.implicits._
    val events = Seq(
      EventStreams.Event(1L, ts(0), 1.0),
      EventStreams.Event(1L, ts(5), 2.0),
      EventStreams.Event(1L, ts(90), 7.0),
      EventStreams.Event(2L, ts(0), 4.0)).toDS()
    // batch mode: flatMapGroupsWithState emits closed sessions; the last
    // open session per key stays in (never-timed-out) state, so only the
    // session closed by the in-batch gap appears.
    val out = EventStreams.sessionizeWithState(events, gapMs = 30 * 60000L)
      .collect().map(s => (s.user_id, s.n_events, s.total_value)).toSet
    assert(out === Set((1L, 2L, 3.0)))
  }

  test("dedupByMinute streaming: dropDuplicatesWithinWatermark keeps one per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.dedupByMinute(df, "2 hours")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // two events in the same (user, type, minute) → one survivor (first
      // arrival); a different minute → its own row
      mem.addData(
        (1L, new Timestamp(60000L), 7L, "click", 1.0),
        (2L, new Timestamp(61000L), 7L, "click", 2.0),
        (3L, new Timestamp(120000L), 7L, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L))
    } finally q.stop()
  }

  test("dedupByMinute batch: deterministic min-id survivor + dup count") {
    import spark.implicits._
    val batch = Seq(
      (5L, new Timestamp(60000L), 7L, "click", 1.0),
      (4L, new Timestamp(61000L), 7L, "click", 2.0),
      (9L, new Timestamp(120000L), 7L, "click", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = EventStreams.dedupByMinute(batch)
      .select("event_id", "n_in_group").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(4L -> 2L, 9L -> 1L))
  }

  test("batch and streaming sessions agree on the same data") {
    import spark.implicits._
    val batch = Seq((ts(0), 7L, 1.0), (ts(10), 7L, 2.0), (ts(100), 7L, 4.0))
      .toDF("ts", "user_id", "value")
    val rows = EventStreams.sessions(batch, "30 minutes")
      .select("user_id", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows === Set((7L, 2L, 3.0), (7L, 1L, 4.0)))
  }

  test("stream-stream interval join matches clicks to preceding views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val views = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.clickAfterView(
        clicks.toDF().toDF("user_id", "ts", "value"),
        views.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      // Batch 1: views only; afterwards watermark = 30min - 20min = 10min.
      views.addData((7L, ts(0), 1.0), (7L, ts(22), 2.0), (7L, ts(30), 3.0),
        (8L, ts(1), 9.0))
      q.processAllAvailable()
      // Batch 2: click at 25min (>= watermark, not late). Its 10-minute
      // lookback [15, 25] matches only the view at 22.
      clicks.addData((7L, ts(25), 0.5))
      q.processAllAvailable()
      val rows = spark.table("ssj_out")
        .select("user_id", "v_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows === Set((7L, 2.0)))
    } finally q.stop()
  }

  test("stream-stream LEFT-OUTER interval join emits unmatched clicks after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val views = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.clickAfterView(
        clicks.toDF().toDF("user_id", "ts", "value"),
        views.toDF().toDF("user_id", "ts", "value"),
        joinType = "left_outer")
      .writeStream.format("memory").queryName("ssj_lo_out")
      .outputMode("append").start()
    try {
      // user 7's click at 25 has a matching view at 22; user 8's click
      // at 26 has NO view in its 10-minute lookback.
      views.addData((7L, ts(22), 2.0), (8L, ts(1), 9.0))
      clicks.addData((7L, ts(25), 0.5), (8L, ts(26), 0.7))
      q.processAllAvailable()
      // Advance both watermarks far past 26+10min so the unmatched
      // click's state can expire and the NULL-padded row is emitted.
      views.addData((99L, ts(300), 0.0))
      clicks.addData((99L, ts(300), 0.0))
      q.processAllAvailable()
      views.addData((99L, ts(400), 0.0))
      clicks.addData((99L, ts(400), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_lo_out")
        .where(col("user_id").isin(7L, 8L))
        .select("user_id", "v_ts").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).isDefined)).toSet
      assert(rows === Set((7L, true), (8L, false)),
        "matched click must carry its view; unmatched click must emit NULL-padded")
    } finally q.stop()
  }

  test("stream-stream join transform gives the same pairs in batch mode") {
    import spark.implicits._
    val clicks = Seq((7L, ts(5), 0.5), (9L, ts(50), 1.5))
      .toDF("user_id", "ts", "value")
    val views = Seq((7L, ts(0), 1.0), (7L, ts(30), 2.0), (9L, ts(45), 3.0))
      .toDF("user_id", "ts", "value")
    val rows = EventStreams.clickAfterView(clicks, views)
      .select("user_id", "v_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows === Set((7L, 1.0), (9L, 3.0)))
  }

  test("file-source E2E: new parquet files are discovered incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ck").toString
    Seq((ts(10), "click", 1.0), (ts(20), "click", 2.0))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.windowedStats(stream, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("file_out")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_out").agg(sum("n")).first().getLong(0) === 2L)
      // A file landing later is picked up by the same continuous query.
      Seq((ts(70), "view", 5.0)).toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(spark.table("file_out").agg(sum("n")).first().getLong(0) === 3L)
    } finally q.stop()
  }
}
