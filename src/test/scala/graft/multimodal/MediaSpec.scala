package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("mediaFromText → extractFeatures: schema, determinism, byte metadata") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "abc")).toDF("doc_id", "text")
    val feats = Media.extractFeatures(Media.mediaFromText(docs, "doc_id", "text"))
      .collect().map(f => f.media_id -> f).toMap
    // byte fold over ASCII == char fold: matches Portable.charHash("hello world")
    assert(feats(1L).checksum === 204910434L)
    assert(feats(1L).n_bytes === 11L)
    assert(feats(1L).first_byte === 'h'.toLong)
    assert(feats(2L).n_bytes === 0L)
    assert(feats(2L).first_byte === -1L)
    assert(feats(2L).checksum === 0L)
    assert(feats(3L).kind === "text/plain")
    // determinism: running twice gives identical features
    val again = Media.extractFeatures(Media.mediaFromText(docs, "doc_id", "text"))
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(again === feats.view.mapValues(_.checksum).toMap)
  }

  test("m3 ASCII contract: gate corpus is single-byte (octet_length == char length)") {
    import org.apache.spark.sql.functions._
    // The m3 oracle windows by BYTE offsets but folds energy/peak over
    // CHARACTERS — internally consistent, and equal to the Spark side's
    // byte-wise PCM walk, only for single-byte ASCII text. Pin that
    // property on the gate corpus so a future multi-byte testdata
    // regeneration fails HERE instead of as an opaque hash mismatch.
    val bad = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .where(octet_length(col("text")) =!= length(col("text"))).count()
    assert(bad === 0L, s"$bad documents contain multi-byte chars: the m3 " +
      "oracle's char-based folds no longer match its byte-based windows")
  }

  test("windowedEnergy: window arithmetic matches a local reference") {
    import spark.implicits._
    val text = "ab" * 300 // 600 bytes -> windows of 256, 256, 88
    val docs = Seq((1L, text), (2L, ""), (3L, "xyz")).toDF("doc_id", "text")
    val got = Media.windowedEnergy(Media.mediaFromText(docs, "doc_id", "text"))
      .collect().map(w => (w.media_id, w.window_idx) -> w).toMap
    assert(got.keys.count(_._1 == 1L) === 3)
    assert(!got.keys.exists(_._1 == 2L), "empty payload yields no windows")
    val bytes = text.getBytes("UTF-8")
    (0 until 3).foreach { k =>
      val slice = bytes.slice(k * 256, (k + 1) * 256).map(b => (b & 0xff).toLong)
      val w = got((1L, k.toLong))
      assert(w.n_samples === slice.length.toLong)
      assert(w.energy === slice.map(s => s * s).sum)
      assert(w.peak === slice.max)
    }
    val xyz = got((3L, 0L))
    assert(xyz.n_samples === 3L)
    assert(xyz.energy === ('x'.toLong * 'x' + 'y'.toLong * 'y' + 'z'.toLong * 'z'))
    assert(xyz.peak === 'z'.toLong)
  }

  test("patchGrid: tile geometry and pixel accounting match a local reference") {
    import spark.implicits._
    // 100 bytes -> raster 32 wide, h = ceil(100/32) = 4 rows (last row 4
    // bytes short), one patch row (4 <= 16), two patch cols.
    val text = ("a" * 100)
    val docs = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val got = Media.patchGrid(Media.mediaFromText(docs, "doc_id", "text"))
      .collect().map(p => (p.media_id, p.patch_row, p.patch_col) -> p).toMap
    assert(!got.keys.exists(_._1 == 2L), "empty payload yields no patches")
    assert(got.keys.count(_._1 == 1L) === 2)
    val left = got((1L, 0L, 0L)); val right = got((1L, 0L, 1L))
    assert(left.patch_h === 4L && left.patch_w === 16L)
    // left tile: rows 0-3 x cols 0-15 -> rows 0-2 full (16 px), row 3 has
    // bytes 96..99 -> 4 px in cols 0-3
    assert(left.n_px === 3 * 16 + 4)
    // right tile: rows 0-2 x cols 16-31 (16 px each), row 3 empty
    assert(right.n_px === 3 * 16)
    // every pixel accounted exactly once across tiles
    assert(left.n_px + right.n_px === 100L)
    assert(left.px_sum === left.n_px * 'a'.toLong)
    assert(right.px_sum === right.n_px * 'a'.toLong)
    // checksum: row-major fold of 'a' bytes
    def fold(n: Long): Long =
      (1L to n).foldLeft(0L)((a, _) => (a * 31 + 'a'.toLong) % Media.FakeCodec.P)
    assert(left.checksum === fold(left.n_px))
    assert(right.checksum === fold(right.n_px))
  }

  test("m5 scene cuts: first frame always cuts; both outcomes occur at spec SF") {
    val rows = graft.operators.MultimodalQueries
      .m5SceneCuts(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (m, rs) =>
      val first = rs.minBy(_._2)
      assert(first._3.isEmpty && first._4, s"media $m first frame must cut")
    }
    assert(rows.exists(r => r._3.isDefined && r._4), "no threshold-crossing cut")
    assert(rows.exists(r => r._3.isDefined && !r._4), "every frame cuts — degenerate")
    rows.foreach { case (_, _, d, cut) =>
      assert(cut === (d.isEmpty || d.get >= 250L))
    }
  }

  test("perceptualHash: local reference, edge payloads, locality property") {
    import spark.implicits._
    val docs = Seq((1L, "a" * 240), (2L, "a" * 239 + "b"), (3L, ""),
      (4L, "xy")).toDF("doc_id", "text")
    val hs = Media.perceptualHash(Media.mediaFromText(docs, "doc_id", "text"))
      .collect().map(h => h.media_id -> h.phash).toMap
    // local reference fold (bytes, 60 windows, parity bit per window)
    def ref(t: String): Long = {
      val b = t.getBytes("UTF-8"); val n = b.length; val w = (n + 59) / 60
      (0 until 60).map { j =>
        var acc = 0L
        (j * w until math.min((j + 1) * w, n)).foreach(i =>
          acc = (acc * 31 + (b(i) & 0xff)) % Media.FakeCodec.P)
        (acc & 1L) << j
      }.sum
    }
    Seq(1L -> "a" * 240, 2L -> ("a" * 239 + "b"), 3L -> "", 4L -> "xy")
      .foreach { case (id, t) => assert(hs(id) === ref(t), s"id $id") }
    assert(hs(3L) === 0L) // empty payload → all-zero hash
    // locality: a single-byte edit in one window flips at most that
    // window's bit — docs 1/2 differ only in the last 4-byte window
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) <= 1)
  }

  test("m6 banded pairing == all-pairs popcount filter at spec SF") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val media = Media.mediaFromText(
      graft.core.Tables.documents(spark, sf), "doc_id", "text")
    val fps = Media.perceptualHash(media).collect().map(h => h.media_id -> h.phash)
    val expect = (for {
      (ia, ha) <- fps; (ib, hb) <- fps
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    val got = graft.operators.MultimodalQueries.m6PhashDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "spec SF must exercise the pairing")
  }

  test("payload survives the binary roundtrip (opaque column)") {
    import spark.implicits._
    val docs = Seq((9L, "opaque payload ≠ text")).toDF("doc_id", "text")
    val rec = Media.mediaFromText(docs, "doc_id", "text").collect().head
    assert(new String(rec.payload, "UTF-8") === "opaque payload ≠ text")
    assert(rec.n_bytes === rec.payload.length.toLong)
  }
}
