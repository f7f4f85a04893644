package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Minimum spanning forest via distributed Borůvka — the reference's
  * declared-but-stub MST capability (`/root/reference/algorithms.h:200`,
  * "Prime/Kruskal 最小生成树") made real. Kruskal's sequential sorted scan
  * doesn't distribute; Borůvka does: every round each component picks its
  * lightest outgoing edge (all components in parallel — one windowed
  * argmin), the picked edges join the forest, and touching components
  * merge. Components at least halve per round → ≤ ⌈log₂ V⌉ rounds.
  *
  * Determinism: ties break on (weight, src, dst) — lexicographic
  * perturbation makes edge weights effectively distinct, so the forest is
  * the unique MSF of the perturbed graph, independent of partitioning.
  *
  * The merge step runs the engine's own connected-components program on
  * the contracted component graph ([[ConnectedComponentsProgram]] under
  * [[GmrRunner]]) — hash-min label propagation, the standard
  * O(diameter)-round merge; the contracted graph shrinks geometrically so
  * later rounds are near-free.
  */
object Mst {

  /** Minimum spanning forest of a canonical (src<dst, weight) edge list.
    * Returns the forest edges `(src, dst, weight)`. */
  def minimumSpanningForest(canonicalEdges: DataFrame, maxRounds: Int = 40): DataFrame = {
    val spark = canonicalEdges.sparkSession
    import spark.implicits._
    val edges = canonicalEdges.select("src", "dst", "weight")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var comp = edges.select(col("src").as("id")).union(edges.select(col("dst").as("id")))
      .distinct().select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var forest = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val labeled = edges
        .join(comp.select(col("id").as("src"), col("comp").as("csrc")), "src")
        .join(comp.select(col("id").as("dst"), col("comp").as("cdst")), "dst")
        .where(col("csrc") =!= col("cdst"))
      // lightest outgoing edge per component (each edge is a candidate for
      // both of its endpoint components)
      val cand = labeled.select(col("csrc").as("c"), col("src"), col("dst"),
          col("weight"), col("cdst"))
        .union(labeled.select(col("cdst").as("c"), col("src"), col("dst"),
          col("weight"), col("csrc")))
      val w = Window.partitionBy("c").orderBy(col("weight"), col("src"), col("dst"))
      val picked = cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .localCheckpoint(true)
      if (picked.isEmpty) done = true
      else {
        forest = forest.union(picked.select("src", "dst", "weight").distinct())
          .localCheckpoint(true)
        // contract: merge the components linked by picked edges via the
        // engine's own hash-min connected components
        val links = picked.select(least(col("c"), col("cdst")).as("src"),
          greatest(col("c"), col("cdst")).as("dst")).distinct()
        val cg = PropertyGraph.fromEdges(PropertyGraph.symmetrize(links))
        val mapping = GmrRunner.run(cg, ConnectedComponentsProgram).vertices
          .select(col("id").as("comp"), col("value").cast("long").as("newcomp"))
        comp = comp.join(mapping, Seq("comp"), "left_outer")
          .select(col("id"), coalesce(col("newcomp"), col("comp")).as("comp"))
          .localCheckpoint(true)
      }
      round += 1
    }
    edges.unpersist(blocking = false)
    forest
  }

  /** Forest summary: edge count and total weight (exact when weights are
    * integer-valued, as the co-occurrence graph's are). */
  def summary(canonicalEdges: DataFrame): DataFrame =
    minimumSpanningForest(canonicalEdges)
      .agg(count(lit(1)).as("n_edges"),
        sum(col("weight")).cast("double").as("total_weight"))
}
