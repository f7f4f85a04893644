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

  test("payload survives the binary roundtrip (opaque column)") {
    import spark.implicits._
    val docs = Seq((9L, "opaque payload ≠ text")).toDF("doc_id", "text")
    val rec = Media.mediaFromText(docs, "doc_id", "text").collect().head
    assert(new String(rec.payload, "UTF-8") === "opaque payload ≠ text")
    assert(rec.n_bytes === rec.payload.length.toLong)
  }
}
