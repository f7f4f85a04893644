package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The engine's surface is also reachable as plain `spark.sql(...)` over
  * registered views — including the injected native `graft_*` functions
  * (SparkSessionExtensions makes them SQL functions, not just Column
  * helpers). Results must agree with the DataFrame formulations. */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def registerViews(): Unit =
    graft.core.Tables.names.foreach { n =>
      graft.core.Tables(spark, sf, n).createOrReplaceTempView(n)
    }

  test("SQL view of q1 equals the DataFrame result") {
    registerViews()
    val sql = spark.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val df = graft.core.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(sql.toSeq === df.toSeq)
  }

  test("native graft_* functions are callable from SQL") {
    registerViews()
    val rows = spark.sql(
      """SELECT doc_id, graft_char_hash(text) AS h,
        |       size(graft_shingle_hashes(text, 3)) AS nsh,
        |       graft_simhash(text) AS fp
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(rows.length === 5)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(3) >= 0))
    // SQL call == Column-API call
    val viaDf = graft.core.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.Portable.charHash(
          org.apache.spark.sql.functions.col("text")).as("h"))
      .orderBy("doc_id").limit(5).collect().map(_.getLong(1))
    assert(rows.map(_.getLong(1)).toSeq === viaDf.toSeq)
  }

  test("SQL windowing + semi join over views agree with the engine plan shapes") {
    registerViews()
    val n = spark.sql(
      """SELECT count(*) FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        |              AND l.l_quantity > 45)""".stripMargin).first().getLong(0)
    val df = graft.core.Tables.orders(spark, sf).join(
      graft.core.Tables.lineitem(spark, sf)
        .where(org.apache.spark.sql.functions.col("l_quantity") > 45)
        .select(org.apache.spark.sql.functions.col("l_orderkey").as("o_orderkey")),
      Seq("o_orderkey"), "left_semi").count()
    assert(n === df)
  }
}
