package graft

import graft.graph.Materialize.MaterializeOps
import org.apache.spark.sql.functions._

/** Builder-side microbench: decomposes g9_scc wall time into derivation /
  * forward-coloring supersteps / backward-mark supersteps / residue size.
  * Not part of the driver contract. */
object SccBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sccbench] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // Same parity orientation as GraphQueries.directedPairs.
    val even = (col("src") + col("dst")) % 2 === 0
    val de = t("derive directed edges") {
      val d = graft.operators.GraphQueries.partPairsMaterialized(spark, sfDir).select(
        when(even, col("src")).otherwise(col("dst")).as("src"),
        when(even, col("dst")).otherwise(col("src")).as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[sccbench] edges: ${d.count()}")
      d
    }
    val verts = t("vertex set") {
      val v = de.select(col("src").as("id")).union(de.select(col("dst").as("id")))
        .distinct().materialize()
      println(s"[sccbench] vertices: ${v.count()}")
      v
    }
    val fwd = t("forward CC to convergence") {
      graft.graph.GmrRunner.run(
        graft.graph.PropertyGraph(verts, de.withColumn("weight", lit(1.0))),
        graft.graph.ConnectedComponentsProgram)
    }
    println(s"[sccbench] forward iterations: ${fwd.iterations}")
    fwd.supersteps.zipWithIndex.foreach { case (s, i) =>
      println(f"[sccbench]   fwd superstep ${i + 1}: $s%6.2f s")
    }
    val full = t("full strongComponents") {
      val r = graft.graph.Scc.strongComponents(de)
      println(s"[sccbench] scc rows: ${r.count()}")
      r
    }
    val nScc = full.select(countDistinct(col("scc"))).first().getLong(0)
    println(s"[sccbench] distinct SCCs: $nScc")
    spark.stop()
  }
}
