package graft

import org.apache.spark.sql.functions._

/** Builder-side microbench: decompose g19's roundtrip (write → stats →
  * read-back → triangle) to find where the time goes. Not part of the
  * driver contract. */
object G19Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](l: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f
      println(f"[g19probe] $l%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r }
    import graft.operators.GraphQueries
    import graft.graph.PropertyGraph
    val parts = 3
    val pairs = t("pairs read") {
      val p = GraphQueries.partPairsMaterialized(spark, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val g = PropertyGraph(
      GraphQueries.vertexDegMaterialized(spark, d).select(col("id")),
      PropertyGraph.symmetrize(pairs))
    val base = s"${sys.props("user.dir")}/target/graft_derived/probe_subgraph_rt"
    new java.io.File(base).getParentFile.mkdirs()
    // decompose the writer's internal phases (mirrors writeMetisSubgraphs)
    t("  w: allIntegral scan") {
      g.edges.where(coalesce(col("weight"), lit(1.0)) =!=
        floor(coalesce(col("weight"), lit(1.0)))).isEmpty
    }
    t("  w: lines build+count") {
      val nbrs = g.edges
        .select(col("src"), col("dst"), coalesce(col("weight"), lit(1.0)).as("w"))
        .groupBy(col("src"))
        .agg(sort_array(collect_list(struct(col("dst"),
          pmod(col("dst"), lit(parts)).as("dpart"), col("w")))).as("ns"))
      g.vertices.select(col("id"))
        .join(nbrs, col("id") === col("src"), "left_outer")
        .select(col("id"), pmod(col("id"), lit(parts)).as("part")).count()
    }
    t("writeMetisSubgraphs") {
      graft.io.GraphLoaders.writeMetisSubgraphs(g, parts, base)
    }
    t("partitionStats") {
      graft.io.GraphLoaders.partitionStats(spark, base, parts).collect()
    }
    val back = t("read-back build") {
      (0 until parts)
        .map(p => graft.io.GraphLoaders.metisSubgraph(spark, s"$base.subgraph.$p").edges)
        .reduce(_ union _)
    }
    val canon = back
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("canon distinct") { canon.count() }
    t("triangle intersect grouped") {
      val tri = graft.graph.GraphOps.edgesWithAdjacency(canon)
        .groupBy(pmod(col("src"), lit(3L)).as("part"))
        .agg(coalesce(sum(call_function("graft_sorted_intersect_count",
            col("asrc"), col("adst"))), lit(0L))
          .cast("long").as("n_triangles"))
      tri.collect().sortBy(_.getLong(0)).foreach(r =>
        println(s"[g19probe]   part ${r.getLong(0)} tri ${r.getLong(1)}"))
    }
    spark.stop()
  }
}
