package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests from FIXTURES.md §A5: hand-computed expectations on tiny
  * graphs (the reference ships no tests, SURVEY.md §5 — these fixtures
  * mirror its known-answer micro-graphs `3line.graph`/`small.graph`). */
class GraphAlgoSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import scala.jdk.CollectionConverters._
  private def edgeDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  /** 3line.graph analog: path 1 → 2 → 3 (undirected). */
  private def lineGraph = PropertyGraph.fromEdges(
    PropertyGraph.symmetrize(edgeDf(1L -> 2L, 2L -> 3L)))

  test("SSSP on a 3-vertex line: dist = 0,1,2 (FIXTURES.md §A5)") {
    val r = GmrRunner.run(lineGraph, new Sssp(1L))
    val dist = r.vertices.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(dist === Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0))
    assert(r.iterations <= 4)
  }

  test("BFS hops equal SSSP on unit weights") {
    val r = GmrRunner.run(lineGraph, new Bfs(1L))
    val hops = r.vertices.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(hops === Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0))
  }

  test("SSSP respects weights (shorter heavy path loses)") {
    import spark.implicits._
    // 1→2 (w=10), 1→3 (w=1), 3→2 (w=1): best dist(2) = 2 via 3.
    val e = Seq((1L, 2L, 10.0), (1L, 3L, 1.0), (3L, 2L, 1.0)).toDF("src", "dst", "weight")
    val r = GmrRunner.run(PropertyGraph.fromEdges(e), new Sssp(1L))
    val dist = r.vertices.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(dist(2L) === 2.0)
  }

  test("fixed mode early-exits on an emptied frontier, result identical (r21)") {
    // Line 1-2-3: CC converges in 2 hops; frontier empties at superstep 3.
    // loopTimed is fixed mode (convergenceCheck=false) — with the r21
    // early exit it must stop well short of the requested 10 supersteps
    // and still produce the exact fixpoint labels.
    val r = GmrRunner.loopTimed(lineGraph, ConnectedComponentsProgram, 10)
    assert(r.iterations < 10, s"expected early exit, ran ${r.iterations}")
    val labels = r.vertices.collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(labels === Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
    // Non-frontier programs must NOT early-exit in fixed mode (PageRank
    // needs every contribution every round).
    val pr = PageRank(lineGraph)
    val r2 = GmrRunner.loopTimed(pr.graph, pr.program, 4)
    assert(r2.iterations === 4)
  }

  test("unreached vertices stay null") {
    val g = PropertyGraph.fromEdges(edgeDf(1L -> 2L, 3L -> 4L))
    val r = GmrRunner.run(g, new Sssp(1L))
    val rows = r.vertices.collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(rows(2L) === Some(1.0))
    assert(rows(3L) === None)
    assert(rows(4L) === None)
  }

  test("connected components: two components get min labels") {
    val g = PropertyGraph.fromEdges(PropertyGraph.symmetrize(
      edgeDf(1L -> 2L, 2L -> 3L, 10L -> 11L)))
    val r = GmrRunner.run(g, ConnectedComponentsProgram)
    val comp = r.vertices.collect().map(x => x.getLong(0) -> x.getDouble(1).toLong).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("triangle count: one triangle + a tail") {
    // canonical pairs: triangle (1,2,3) + edge 3-4
    val tris = GraphOps.triangleCount(edgeDf(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L))
    assert(tris === 1L)
  }

  test("oriented and intersect triangle counts equal the naive 3-way join count") {
    // two triangles sharing edge 2-3, plus a tail
    val e = edgeDf(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 5L)
    assert(GraphOps.orientedTriangleCountDF(e).first().getLong(0) ===
      GraphOps.triangleCount(e))
    assert(GraphOps.triangleCountViaIntersect(e).first().getLong(0) ===
      GraphOps.triangleCount(e))
    assert(GraphOps.triangleCount(e) === 2L)
    // triangle-free graph → 0 (coalesce guard on the empty sum)
    val tf = edgeDf(1L -> 2L, 2L -> 3L)
    assert(GraphOps.triangleCountViaIntersect(tf).first().getLong(0) === 0L)
  }

  test("triangle kernel selector: both forced regimes agree, kernels actually differ") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val e = edgeDf(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 5L,
      3L -> 5L, 1L -> 5L)
    val key = "spark.graft.adjacencyBroadcastBytes"
    def grouped(): Map[Long, Long] =
      GraphOps.triangleCountByGroup(e, x => pmod(x, lit(2L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      // regime 1: adjacency fits → broadcast-adjacency intersect kernel
      spark.conf.set(key, "10485760")
      assert(GraphOps.adjacencyFitsBroadcast(e))
      val broadcastTotal = GraphOps.triangleCountAuto(e).first().getLong(0)
      val broadcastGroups = grouped()
      assert(GraphOps.triangleCountAuto(e).queryExecution.executedPlan.toString
        .contains("graft_sorted_intersect_count"))
      // regime 2: adjacency exceeds the budget → shuffle wedge join
      spark.conf.set(key, "1")
      assert(!GraphOps.adjacencyFitsBroadcast(e))
      val wedgeTotal = GraphOps.triangleCountAuto(e).first().getLong(0)
      val wedgeGroups = grouped()
      assert(!GraphOps.triangleCountAuto(e).queryExecution.executedPlan.toString
        .contains("graft_sorted_intersect_count"))
      assert(broadcastTotal === wedgeTotal)
      assert(broadcastTotal === GraphOps.triangleCount(e))
      assert(broadcastGroups === wedgeGroups)
      assert(broadcastGroups.values.sum === broadcastTotal)
      // Contract regression: a group with edges but ZERO triangles must
      // appear (n_triangles = 0) in BOTH kernels — the wedge fallback
      // originally dropped such rows, so the selector changed the
      // output row set whenever the data crossed the broadcast budget.
      val e0 = edgeDf(1L -> 2L, 1L -> 3L, 2L -> 3L, 4L -> 5L)
      def g0(): Map[Long, Long] =
        GraphOps.triangleCountByGroup(e0, x => pmod(x, lit(2L))).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.conf.set(key, "10485760")
      val bG = g0()
      spark.conf.set(key, "1")
      val wG = g0()
      assert(bG === Map(0L -> 0L, 1L -> 1L))
      assert(wG === bG)
    } finally spark.conf.unset(key)
  }

  test("grouped-triangle wedge fallback spreads a hot middle vertex (skew salt)") {
    import org.apache.spark.sql.functions.{lit, pmod}
    import spark.implicits._
    // Star with the hub at a MIDDLE id: 300 low leaves point in
    // (leaf → hub) and 300 high leaves point out (hub → leaf) under the
    // canonical src<dst orientation, so the id-oriented wedge join
    // funnels in·out = 90,000 wedge pairs through the single
    // middle-vertex key — the documented straggler class the broadcast
    // budget's fallback is exposed to. Three closing edges make three
    // real triangles through the hub.
    val hub = 1000L
    val low = (0L until 300L).map(l => (l, hub))
    val high = (0L until 300L).map(h => (hub, 1001L + h))
    val closing = Seq((0L, 1001L), (1L, 1002L), (2L, 1003L))
    val e = (low ++ high ++ closing).toDF("src", "dst")
    val budgetKey = "spark.graft.adjacencyBroadcastBytes"
    val thrKey = "spark.graft.wedgeSaltThreshold"
    // Restore whatever AQE setting the suite session runs with, not a
    // hardcoded "true" (ADVICE r9: the hardcode leaked config if the
    // session ever ran with AQE off by default).
    val aqePrior = spark.conf.getOption("spark.sql.adaptive.enabled")
    try {
      spark.conf.set(thrKey, "1000") // 90,000 ≥ 1000 → the hub is hot
      // forced fallback == intersect kernel on the star fixture
      spark.conf.set(budgetKey, "1")
      assert(!GraphOps.adjacencyFitsBroadcast(e))
      val fb = GraphOps.triangleCountByGroup(e, x => pmod(x, lit(3L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.conf.set(budgetKey, "10485760")
      val bc = GraphOps.triangleCountByGroup(e, x => pmod(x, lit(3L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fb === bc, "salted fallback must equal the intersect kernel")
      assert(fb.values.sum === 3L)
      // the hub's wedge set actually spreads: no shuffle partition of
      // the salted wedge frame holds more than 4× the mean non-empty
      // load (unsalted, ONE partition holds all 90k wedge pairs). AQE's
      // small-partition coalescing is disabled for the measurement —
      // at real scale the hot partitions are nowhere near the advisory
      // size, so coalescing would never merge them.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val sizes = GraphOps.saltedWedges(e).rdd
        .mapPartitions(it => Iterator(it.size.toLong)).collect().filter(_ > 0)
      val total = sizes.sum
      assert(total >= 90000L, s"expected the hub's wedge set, saw $total")
      assert(sizes.length > 1, "wedges must land in more than one partition")
      val mean = total / sizes.length
      assert(sizes.max <= 4 * mean,
        s"straggler partition: max ${sizes.max} vs mean $mean (sizes: ${sizes.toSeq})")
    } finally {
      spark.conf.unset(budgetKey)
      spark.conf.unset(thrKey)
      aqePrior match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }

  test("salted wedge enumeration stays exact when EVERY middle is hot") {
    import org.apache.spark.sql.functions.{lit, pmod}
    import spark.implicits._
    // Threshold 1 salts every wedge middle, so the exactly-once-meeting
    // property (each wedge's a-side carries one salt, the b-side
    // replicates across all salts, they meet at exactly one key) is
    // exercised on every vertex of a seeded random graph — not just a
    // single engineered hub.
    val rnd = new scala.util.Random(20260814)
    val n = 60
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.15
    } yield (a, b)).toDF("src", "dst")
    val budgetKey = "spark.graft.adjacencyBroadcastBytes"
    val thrKey = "spark.graft.wedgeSaltThreshold"
    try {
      spark.conf.set(thrKey, "1")
      spark.conf.set(budgetKey, "1")
      val fb = GraphOps.triangleCountByGroup(edges, x => pmod(x, lit(4L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.conf.set(budgetKey, "10485760")
      val bc = GraphOps.triangleCountByGroup(edges, x => pmod(x, lit(4L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fb === bc, "fully-salted fallback must equal the intersect kernel")
      assert(fb.values.sum === GraphOps.triangleCount(edges))
      assert(fb.values.sum > 0, "fixture must contain triangles")
    } finally {
      spark.conf.unset(budgetKey)
      spark.conf.unset(thrKey)
    }
  }

  test("per-vertex triangle counts credit all corners") {
    val per = GraphOps.triangleCounts(edgeDf(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(per === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("PageRank: ranks sum to ~1 and hub outranks leaves (star graph)") {
    // star: center 1 connected to 2,3,4,5 (undirected)
    val g = PropertyGraph.fromEdges(PropertyGraph.symmetrize(
      edgeDf(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L)))
    val pr = PageRank(g).fixed(20).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    assert(pr(1L) > pr(2L) * 2)
    // leaves symmetric
    assert(math.abs(pr(2L) - pr(5L)) < 1e-12)
  }

  test("PageRank.compat uses the reference's d=0.5 damping (algorithms.h:30)") {
    val g = PropertyGraph.fromEdges(PropertyGraph.symmetrize(
      edgeDf(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L)))
    val std = PageRank(g).fixed(10).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val compat = PageRank.compat(g).fixed(10).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // lower damping → flatter distribution: hub rank shrinks toward 1/n
    assert(compat(1L) < std(1L))
    assert(math.abs(compat.values.sum - 1.0) < 1e-6)
  }

  test("personalized PageRank: mass conserved, concentrated toward the seed") {
    // star with seeded center 100 (id % 100 == 0), leaves 1,2,3 plus a
    // distance-2 tail 3-4: relevance decays with distance from the seed
    val g = PropertyGraph.fromEdges(PropertyGraph.symmetrize(
      edgeDf(100L -> 1L, 100L -> 2L, 100L -> 3L, 3L -> 4L)))
    val pr = GmrRunner.runFixed(PropertyGraph(g.degrees, g.edges),
        new PersonalizedPageRank(nSeeds = 1, isSeed = col("id") % 100 === 0), 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // dangling-free graph: teleport + propagation conserve total mass 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    assert(pr(100L) > pr(1L), "seed must outrank a leaf")
    assert(math.abs(pr(1L) - pr(2L)) < 1e-12, "symmetric leaves rank equal")
    assert(pr(3L) > pr(4L), "tail end ranks below its attachment")
    assert(pr.values.forall(_ >= 0.0))
  }

  test("PageRank convergence mode stops under the iteration cap") {
    val g = PropertyGraph.fromEdges(PropertyGraph.symmetrize(
      edgeDf(1L -> 2L, 2L -> 3L, 3L -> 1L)))
    val run = PageRank(g).converged()
    // 3-cycle is regular: uniform ranks from iteration 1, converges fast
    assert(run.iterations < 10)
    val pr = run.vertices.select("id", "value").collect().map(x => x.getDouble(1))
    pr.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-4))
  }

  test("frontier-incremental LPA equals full recompute at every round count") {
    import spark.implicits._
    // Seeded graph shaped so frontiers SHRINK: two dense communities, a
    // bridge, and a pendant chain — round 1 is always full, round 2's
    // frontier typically exceeds the half-of-V cutoff (full again), and
    // the tail rounds engage the incremental path with a frontier
    // collapsed to the community boundary. Both code paths exercised.
    val rnd = new scala.util.Random(42)
    val e1 = for { a <- 0L until 12L; b <- 0L until 12L
                   if a < b && rnd.nextDouble() < 0.5 } yield (a, b)
    val e2 = for { a <- 20L until 32L; b <- 20L until 32L
                   if a < b && rnd.nextDouble() < 0.5 } yield (a, b)
    val bridge = Seq((11L, 20L), (40L, 41L), (41L, 42L), (42L, 43L))
    val g = PropertyGraph.fromEdges(PropertyGraph.symmetrize(
      (e1 ++ e2 ++ bridge).toDF("src", "dst")))
    def labelsAt(k: Int, frontier: Boolean): Map[Long, Long] = {
      spark.conf.set("spark.graft.lpa.frontier", frontier.toString)
      GraphOps.labelPropagation(g, k).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    try {
      // Per-round equality: equal final labels at EVERY iteration count
      // k pins every intermediate round (round k is some run's last).
      for (k <- 1 to 6)
        assert(labelsAt(k, frontier = true) === labelsAt(k, frontier = false),
          s"frontier and full recompute diverged at round $k")
    } finally spark.conf.unset("spark.graft.lpa.frontier")
  }

  test("frontier LPA early-exits at the fixpoint with the exact fixed-iter result") {
    // A triangle + isolated vertex converges (all-1 by round 3); the
    // frontier run's empty-frontier exit must still equal a full 20-round
    // recompute (remaining rounds are provable no-ops). Note sync LPA
    // does NOT converge on every graph (bipartite label swaps) — the
    // early exit only fires on a genuinely empty frontier.
    val g = PropertyGraph.fromEdges(PropertyGraph.symmetrize(
      edgeDf(1L -> 2L, 2L -> 3L, 1L -> 3L, 7L -> 8L)))
    def labelsAt(k: Int, frontier: Boolean): Map[Long, Long] = {
      spark.conf.set("spark.graft.lpa.frontier", frontier.toString)
      GraphOps.labelPropagation(g, k).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    try {
      val full = labelsAt(20, frontier = false)
      assert(labelsAt(20, frontier = true) === full)
      assert(full.view.filterKeys(Set(1L, 2L, 3L)).values.toSet.size === 1,
        "triangle must agree on one label at the fixpoint")
    } finally spark.conf.unset("spark.graft.lpa.frontier")
  }

  test("partition invariance: same SSSP result with 1 and 4 shuffle partitions") {
    // the property GMR's partitioning machinery was meant to preserve (SURVEY §5)
    val g = PropertyGraph.fromEdges(PropertyGraph.symmetrize(
      edgeDf(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L)))
    def distsWith(parts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try GmrRunner.run(g, new Sssp(1L)).vertices.collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(distsWith("1") === distsWith("4"))
  }
}
