package graft.io

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the persistent form of the co-located join (SURVEY.md §4:
  * "bucketing for co-located joins"). Writing both sides bucketed+sorted
  * by the join key lets Spark satisfy the join's distribution requirement
  * from the file layout — no Exchange on either side at read time. At
  * 100 TB that turns every recurring fact-to-fact join on the bucket key
  * into a zero-shuffle sort-merge join. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("bucketed+sorted tables sort-merge join with no shuffle exchange") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val left = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "a")
    val right = (1L to 500L).map(i => (i % 100, i * 2)).toDF("k", "b")
    left.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/l").mode("overwrite").saveAsTable("bkt_l")
    right.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/r").mode("overwrite").saveAsTable("bkt_r")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_l").join(spark.table("bkt_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 5000L) // 100 keys x (10 left x 5 right)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_l")
      spark.sql("DROP TABLE IF EXISTS bkt_r")
    }
  }
}
