package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Each query is forced through a `noop` sink write — `count()` would let
  * Catalyst prune projections/sorts and under-measure. One warmup action
  * first so JVM/codegen startup isn't billed to the first query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // Warmup: JVM/codegen/shuffle startup must not be billed to the first
    // queries (alphabetically the dedup family) — touch a scan, a hash
    // projection, and a small shuffle once.
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    locally {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
        .select(col("doc_id"), sha2(col("text"), 256).as("h"))
        .groupBy("h").count().count()
    }
    // SPARK_GRAFT_BENCH_ONLY=g1_pagerank,g5_... : builder-side subset runs
    // while iterating on one query; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop caches/checkpoint blocks between queries (not billed to the
      // query) so block-manager pressure from iterative queries doesn't
      // poison later measurements in the shared local-mode JVM.
      spark.catalog.clearCache()
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
