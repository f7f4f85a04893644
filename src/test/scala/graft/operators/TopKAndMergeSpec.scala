package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: the CDC merge (q44), bounded top-k per group
  * (q45), global top-k n-grams (t10) and exactly-k group sample (d13)
  * each cross-checked against a straightforward local reference — the
  * DuckDB oracle proves cross-engine determinism, these prove the
  * distributed formulations implement the intended semantics. */
class TopKAndMergeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("q44 merge honors all four MERGE branches") {
    val base = graft.core.Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal").collect()
      .filter(r => r.getLong(0) % 7 != 0)
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    val delta = graft.core.Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey", "o_totalprice").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(r => math.round(r.getDouble(1) * 100)).sum }
    val expected = (base.keySet ++ delta.keySet).toSeq.sorted.flatMap { k =>
      (base.get(k), delta.get(k)) match {
        case (_, Some(_)) if k % 13 == 0 => None // delete wins
        case (Some(_), Some(d))          => Some((k, d, "update"))
        case (None, Some(d))             => Some((k, d, "insert"))
        case (Some(b), None)             => Some((k, b, "keep"))
        case (None, None)                => None
      }
    }
    val got = RelationalQueries.q44Upsert(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === expected)
    // every branch must actually occur in the fixture
    assert(got.map(_._3).toSet === Set("update", "insert", "keep"))
    assert(delta.keys.exists(k => k % 13 == 0), "fixture has no deletes")
  }

  test("q45 bounded heap equals the windowed top-3 reference") {
    val qty = graft.core.Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_partkey", "l_quantity").collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case ((s, p), rs) =>
        (s, p, rs.map(r => math.round(r.getDouble(2) * 100)).sum) }
    val expected = qty.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (s, rows) =>
      rows.toSeq.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex.map {
        case ((_, p, qc), i) => (s, (i + 1).toLong, p, qc / 100.0)
      }
    }
    val got = RelationalQueries.q45TopkGroup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("t10 equals a local bigram count") {
    val texts = graft.core.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach { t =>
      val w = t.split(" ", -1)
      (0 until w.length - 1).foreach(i => counts(w(i) + " " + w(i + 1)) += 1)
    }
    val expected = counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(20)
      .sortBy(_._1)
    val got = TextQueries.t10TopNgrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("d13 returns exactly the k smallest draws per source") {
    val draws = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        graft.functions.Portable.charHash(concat(col("text"), lit("samp1"))).as("draw"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = draws.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (s, rows) =>
      rows.toSeq.sortBy(t => (t._3, t._2)).take(5).zipWithIndex.map {
        case ((_, id, dr), i) => (s, (i + 1).toLong, id, dr)
      }
    }
    val got = DedupQueries.d13GroupSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // reproducible: a second run returns byte-identical rows
    val again = DedupQueries.d13GroupSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(again === got)
  }
}
