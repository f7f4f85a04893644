package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sink coverage beyond the Verify parquet dump (SURVEY §2.2 "Sinks"):
  * partitioned parquet writes and the partition-pruning read path —
  * Catalyst must turn a filter on the partition column into
  * PartitionFilters (no data files of other partitions read). */
class SinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("partitioned parquet roundtrip with partition pruning") {
    val out = java.nio.file.Files.createTempDirectory("sink").toString
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(s"$out/li")
    val back = spark.read.parquet(s"$out/li")
    // pruned read: only the R partition directory is scanned
    val r = back.where(col("l_returnflag") === "R")
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"),
      s"expected partition pruning in:\n$plan")
    val expect = li.where(col("l_returnflag") === "R").count()
    assert(r.count() === expect)
    // full roundtrip preserves rows
    assert(back.count() === li.count())
  }

  test("bucketed table write co-locates the join key (sortWithinPartitions path)") {
    // saveAsTable bucketing needs a warehouse/catalog; the lighter-weight
    // scale pattern is repartition + sortWithinPartitions before write so
    // downstream same-key reads see clustered files.
    val out = java.nio.file.Files.createTempDirectory("sink").toString
    graft.core.Tables.orders(spark, sf)
      .repartition(4, col("o_custkey")).sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$out/ord")
    val back = spark.read.parquet(s"$out/ord")
    assert(back.count() === graft.core.Tables.orders(spark, sf).count())
  }
}
