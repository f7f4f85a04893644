package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed property graph: the Spark-native replacement for the
  * reference's three graph layouts (CSR `graph_t`, `/root/reference/graph.h:26-39`;
  * Zoltan `GRAPH_DATA`, `partition.h:68-79`; per-vertex `Vertex`,
  * `gmr.h:63-72`).
  *
  * Representation: two DataFrames.
  *  - `vertices(id: LONG, ...)` — one row per vertex; algorithm state lives
  *    in a `value` column managed by [[GmrRunner]] (the reference reuses
  *    `fvwgts` for this, `graph.h:33`).
  *  - `edges(src: LONG, dst: LONG, weight: DOUBLE)` — directed edge list.
  *    An undirected graph materializes both directions (the reference's
  *    input files do the same, FIXTURES.md §A1).
  *
  * Deliberately dropped from the reference's model:
  *  - `adjloc`/`nborProc` (owning partition of each edge target,
  *    `graph.h:37`): Spark's shuffle service owns placement; a
  *    `repartition($"src")` on edges replaces all manual ghost bookkeeping.
  *  - `MAX_NEIGHBORSIZE`=102400 cap (`gmr.h:30`): no materialized
  *    per-vertex neighbor array on the hot path, so no cap.
  *  - int32 ids / float32 values: LONG/DOUBLE (SURVEY.md §1.2).
  */
final case class PropertyGraph(vertices: DataFrame, edges: DataFrame) {

  /** Out-degree per vertex (left join keeps isolated vertices at 0).
    * A vertex table already carrying a `deg` column (the materialized
    * derived-graph path) short-circuits the edge aggregation. */
  def degrees: DataFrame =
    if (vertices.columns.contains("deg")) vertices.select("id", "deg")
    else {
      val d = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      vertices.select("id").join(d, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
    }
}

object PropertyGraph {

  /** Build a graph from an edge list alone; the vertex set is the distinct
    * endpoint set (the reference back-fills id gaps with isolated vertices,
    * `partition.h:628-642` — we keep only realized ids; loaders that need
    * the gap-fill quirk do it themselves). */
  def fromEdges(edges: DataFrame): PropertyGraph = {
    val e =
      if (edges.columns.contains("weight")) edges.select("src", "dst", "weight")
      else edges.select(col("src"), col("dst"), lit(1.0).as("weight"))
    val v = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
    PropertyGraph(v, e)
  }

  /** Symmetrize a canonical (src<dst) pair list into a directed edge list
    * with both directions — undirected-graph view. */
  def symmetrize(pairs: DataFrame): DataFrame = {
    val p =
      if (pairs.columns.contains("weight")) pairs.select("src", "dst", "weight")
      else pairs.select(col("src"), col("dst"), lit(1.0).as("weight"))
    p.union(p.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
  }
}
