package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partitioned writes: the directory-valued column must come
  * back intact and a filter on it must prune at PLANNING time
  * (PartitionFilters on the scan, only matching directories listed) —
  * the third leg of the layout story next to bucketing (BucketingSpec)
  * and z-ordering (ZOrderLayoutSpec): partition on the coarse
  * always-filtered dimension, z-order inside partitions on the rest. */
class PartitionPruneSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("date-partitioned write prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ppart").toString
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(s"$dir/events")

    val back = spark.read.parquet(s"$dir/events")
    assert(back.count() === ev.count(), "roundtrip must preserve rows")

    val days = ev.select("day").distinct().collect().map(_.getString(0)).sorted
    assert(days.length > 1, "fixture must span multiple days")
    val pick = days(days.length / 2)

    val q = back.where(col("day") === pick)
    // planning-time pruning: the scan's partition filters mention day,
    // and the file index only retains the matching directory
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("day"),
      s"no partition filter in scan:\n$scanStr")
    val files = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(s"day=$pick")),
      s"read touched non-matching partitions: ${files.mkString(", ")}")
    // and the values agree with an unpartitioned filter
    assert(q.count() === ev.where(col("day") === pick).count())
  }
}
