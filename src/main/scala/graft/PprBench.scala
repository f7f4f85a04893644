package graft

import org.apache.spark.sql.functions._

/** Builder-side microbench: PageRank vs PersonalizedPageRank superstep
  * cost on the same derived graph. Not part of the driver contract. */
object PprBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pprbench] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val g = t("partGraph") { graft.operators.GraphQueries.partGraph(spark, sfDir) }
    val degs = g.degrees
    val n = t("degrees count") { degs.count() }
    val std = t("PageRank 5 supersteps") {
      graft.graph.GmrRunner.loopTimed(
        graft.graph.PropertyGraph(degs, g.edges), new graft.graph.PageRank(n), 5)
    }
    std.supersteps.zipWithIndex.foreach { case (s, i) =>
      println(f"[pprbench]   pr superstep ${i + 1}: $s%6.2f s") }
    val nSeeds = t("seed count") { degs.where(col("id") % 100 === 0).count() }
    val ppr = t("PPR 5 supersteps") {
      graft.graph.GmrRunner.loopTimed(
        graft.graph.PropertyGraph(degs, g.edges),
        new graft.graph.PersonalizedPageRank(nSeeds, col("id") % 100 === 0), 5)
    }
    ppr.supersteps.zipWithIndex.foreach { case (s, i) =>
      println(f"[pprbench]   ppr superstep ${i + 1}: $s%6.2f s") }
    spark.stop()
  }
}
