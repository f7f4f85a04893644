package graft.graph

import graft.graph.Materialize.MaterializeOps
import org.apache.spark.sql.DataFrame
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
  * The merge step is hybrid. The per-round component-link list has at
  * most one edge per component — after round 1 that is ≤ |V|/2 rows and
  * shrinks geometrically — so when it fits a driver buffer
  * (`driverMergeLimit` pairs) the contraction is a driver-side
  * union-find: zero extra distributed actions, which is what makes the
  * query robust on a busy cluster (each Spark action pays scheduling
  * latency; the fully-distributed variant runs O(rounds × diameter) of
  * them). Beyond the limit it falls back to the engine's own
  * connected-components program ([[ConnectedComponentsProgram]] under
  * [[GmrRunner]]) on the contracted graph — the standard hash-min
  * O(diameter)-round merge that never materializes anything driver-side.
  */
object Mst {

  /** Minimum spanning forest of a canonical (src<dst, weight) edge list.
    * Returns the forest edges `(src, dst, weight)`. */
  def minimumSpanningForest(canonicalEdges: DataFrame, maxRounds: Int = 40,
                            driverMergeLimit: Long = 1000000L,
                            localFinishLimit: Long = 100000L): DataFrame = {
    val spark = canonicalEdges.sparkSession
    import spark.implicits._
    val edges = canonicalEdges.select("src", "dst", "weight")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var comp = edges.select(col("src").as("id")).union(edges.select(col("dst").as("id")))
      .distinct().select(col("id"), col("id").as("comp"))
      .materialize()
    // r21 (the GmrRunner superstep discipline, guide §2.4/§3.1): the
    // component-label frame is O(V) — when V fits the state-broadcast
    // budget both labeling joins broadcast it and the persisted edge list
    // streams map-side; beyond the budget the pre-r21 shuffle joins.
    val fits = GraphOps.stateBroadcastFits(spark, comp.count())
    def hint(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    var forest = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    // Edges inside one component can never be picked again — merging only
    // grows components, so filtering on the current labels is sound and
    // the working edge set shrinks geometrically with the rounds.
    var liveEdges = edges
    var round = 0
    var done = false
    // r22: broadcast-fit rounds skip AQE's per-round replanning (see
    // GraphOps.withLoopAqe); the nested CC fallback manages its own.
    GraphOps.withLoopAqe(spark, fits) {
    while (round < maxRounds && !done) {
      val labeled = liveEdges
        .join(hint(comp.select(col("id").as("src"), col("comp").as("csrc"))), "src")
        .join(hint(comp.select(col("id").as("dst"), col("comp").as("cdst"))), "dst")
        .where(col("csrc") =!= col("cdst"))
        .materialize()
      liveEdges = labeled.select("src", "dst", "weight")
      // Local finish (the standard distributed-MST endgame): the
      // contracted inter-component graph shrinks geometrically per round;
      // once it fits a driver buffer, one Kruskal pass over component
      // labels replaces the remaining O(log V) rounds of cluster actions.
      // The perturbed edge order (weight, src, dst) has a unique MSF, so
      // Kruskal here and further Borůvka rounds produce identical edges.
      if (labeled.count() <= localFinishLimit) {
        val rest = localKruskal(labeled)
        if (rest.nonEmpty) forest = forest.union(rest.toDF("src", "dst", "weight"))
        done = true
      } else {
      // lightest outgoing edge per component (each edge is a candidate for
      // both of its endpoint components)
      val cand = labeled.select(col("csrc").as("c"), col("src"), col("dst"),
          col("weight"), col("cdst"))
        .union(labeled.select(col("cdst").as("c"), col("src"), col("dst"),
          col("weight"), col("csrc")))
      // r21 (guide §2.3 "aggregate before you shuffle"): the per-component
      // lightest-edge pick is an argmin — the row_number window it
      // replaces sorted the FULL candidate list inside each partition
      // with no partial aggregation; min(struct(...)) hash-aggregates
      // map-side so only one row per component crosses the exchange.
      // Identical pick: within a component, (weight, src, dst) is unique
      // (csrc ≠ cdst means an edge appears at most once per side), so the
      // lexicographic struct-min is exactly the window's ORDER BY head,
      // and cdst rides along functionally determined by (c, src, dst).
      val picked = cand.groupBy(col("c"))
        .agg(min(struct(col("weight"), col("src"), col("dst"), col("cdst")))
          .as("m"))
        .select(col("c"), col("m.src").as("src"), col("m.dst").as("dst"),
          col("m.weight").as("weight"), col("m.cdst").as("cdst"))
        .materialize()
      if (picked.isEmpty) done = true
      else {
        forest = forest.union(picked.select("src", "dst", "weight").distinct())
          .materialize()
        // contract the components linked by the picked edges
        val links = picked.select(least(col("c"), col("cdst")).as("src"),
          greatest(col("c"), col("cdst")).as("dst")).distinct()
          .materialize()
        val nLinks = links.count()
        val mapping =
          if (nLinks <= driverMergeLimit) driverUnionFind(links)
          else {
            val cg = PropertyGraph.fromEdges(PropertyGraph.symmetrize(links))
            GmrRunner.run(cg, ConnectedComponentsProgram).vertices
              .select(col("id").as("comp"), col("value").cast("long").as("newcomp"))
          }
        comp = comp.join(mapping, Seq("comp"), "left_outer")
          .select(col("id"), coalesce(col("newcomp"), col("comp")).as("comp"))
          .materialize()
      }
      }
      round += 1
    }
    }
    edges.unpersist(blocking = false)
    forest
  }

  /** Kruskal over the collected contracted graph: union-find on component
    * labels, edges scanned in (weight, src, dst) order. */
  private def localKruskal(labeled: DataFrame): Seq[(Long, Long, Double)] = {
    val rows = labeled.select("src", "dst", "weight", "csrc", "cdst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .sortBy { case (s, d, w, _, _) => (w, s, d) }
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    rows.flatMap { case (s, d, w, cs, cd) =>
      val (ra, rb) = (find(cs), find(cd))
      if (ra == rb) None
      else { if (ra < rb) parent(rb) = ra else parent(ra) = rb; Some((s, d, w)) }
    }.toSeq
  }

  /** Driver union-find over a (small) component-link list → broadcastable
    * `(comp, newcomp)` mapping with min-label roots (labels don't affect
    * the forest — picks group by component *sets* — but min roots keep
    * intermediate state bit-deterministic run to run). */
  private def driverUnionFind(links: DataFrame): DataFrame = {
    val spark = links.sparkSession
    import spark.implicits._
    val pairs = links.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val members = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    broadcast(members.map(m => (m, find(m))).toSeq.toDF("comp", "newcomp"))
  }

  /** Forest summary: edge count and total weight (exact when weights are
    * integer-valued, as the co-occurrence graph's are). */
  def summary(canonicalEdges: DataFrame): DataFrame =
    minimumSpanningForest(canonicalEdges)
      .agg(count(lit(1)).as("n_edges"),
        sum(col("weight")).cast("double").as("total_weight"))
}
