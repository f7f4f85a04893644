package graft

import org.apache.spark.sql.functions._

/** Builder-side microbench: decomposes g1_pagerank wall time into graph
  * derivation / degree count / per-superstep cost on SPARK_GRAFT_SF_DIR.
  * Not part of the driver contract. */
object GBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gbench] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val g = t("partGraph (lazy)") { graft.operators.GraphQueries.partGraph(spark, sfDir) }
    val nPairs = t("pairs materialize (count)") { g.edges.count() }
    println(s"[gbench] directed edges: $nPairs")
    val degs = g.degrees
    val n = t("degree count action") { degs.count() }
    println(s"[gbench] vertices: $n")
    val pr = new graft.graph.PageRank(n)
    // A/B the loop under AQE on/off (SPARK_GRAFT_AQE=false to disable):
    // per-superstep materializations re-plan under AQE; measure the cost.
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    val run = t("5 supersteps (runFixed)") {
      graft.graph.GmrRunner.loopTimed(
        graft.graph.PropertyGraph(degs, g.edges), pr, 5)
    }
    run.supersteps.zipWithIndex.foreach { case (s, i) =>
      println(f"[gbench]   superstep ${i + 1}: $s%6.2f s")
    }
    t("final orderBy+noop") {
      run.vertices.select(col("id"), round(col("value"), 8).as("rank")).orderBy("id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
