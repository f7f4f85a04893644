package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-query invariants for the round-7 continuation reports — the
  * relationships BETWEEN gated queries that no single-query oracle can
  * check (each oracle replays one pipeline; these assert that two
  * independent pipelines agree about the same underlying facts).
  */
class ReportInvariantsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("d26 leakage cells partition d3's verified pair list exactly") {
    val pairTotal = DedupQueries.d3MinhashLsh(spark, sf).count()
    val cellTotal = DedupQueries.d26SplitLeakage(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).first().getLong(0)
    assert(cellTotal === pairTotal,
      "every near-dup pair must land in exactly one split-pair cell")
  }

  test("d24 yield rolls up d6's assignment without losing a doc") {
    import org.apache.spark.sql.functions._
    val y = DedupQueries.d24DedupYield(spark, sf)
      .agg(sum("n_docs").as("docs"), sum("n_dups").as("dups"),
        sum("n_kept").as("kept")).first()
    val d6 = DedupQueries.d6DedupClusters(spark, sf)
    assert(y.getLong(0) === d6.count())
    assert(y.getLong(1) === d6.where(col("is_dup")).count())
    assert(y.getLong(2) === y.getLong(0) - y.getLong(1))
  }

  test("d27 cluster sizes partition the corpus; dup share matches d24") {
    import org.apache.spark.sql.functions._
    val cz = DedupQueries.d27ClusterSizes(spark, sf)
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(cz.agg(sum("n_docs_in")).first().getLong(0) === docs)
    // docs inside clusters of size >= 2, minus one canonical per cluster,
    // is exactly d24's total dup count
    val dupDocs = cz.where(col("cluster_size") >= 2)
      .agg(coalesce(sum(col("n_docs_in") - col("n_clusters")), lit(0L)))
      .first().getLong(0)
    val d24Dups = DedupQueries.d24DedupYield(spark, sf)
      .agg(sum("n_dups")).first().getLong(0)
    assert(dupDocs === d24Dups)
  }

  test("g25 component sizes partition the vertex set; shares are a near-partition of 1e6") {
    import org.apache.spark.sql.functions._
    val cs = GraphQueries.g25ComponentSizes(spark, sf)
    val v = GraphQueries.g4Components(spark, sf).count()
    val covered = cs.agg(sum(col("size") * col("n_components"))).first().getLong(0)
    assert(covered === v, "Σ size·n_components must equal |V|")
    val shares = cs.agg(sum("vertex_share_ppm")).first().getLong(0)
    // integer floor division loses < 1 ppm per row
    assert(shares <= 1000000L && shares > 1000000L - cs.count())
  }

  test("g24 rich-club: phi in [0, 1e6]; N_k and E_k decrease in k") {
    val rows = GraphQueries.g24RichClub(spark, sf)
      .orderBy("pct").collect()
    rows.foreach { r =>
      val phi = r.getAs[Long]("phi_ppm")
      assert(phi >= 0L && phi <= 1000000L)
    }
    val nk = rows.map(_.getAs[Long]("n_k"))
    val ek = rows.map(_.getAs[Long]("e_k"))
    val ks = rows.map(_.getAs[Long]("k"))
    ks.zip(ks.tail).foreach { case (a, b) => assert(a <= b) }
    nk.zip(nk.tail).zip(ks.zip(ks.tail)).foreach { case ((a, b), (ka, kb)) =>
      if (ka < kb) assert(a >= b, "a higher cutoff cannot admit more vertices")
    }
    ek.zip(ek.tail).zip(ks.zip(ks.tail)).foreach { case ((a, b), (ka, kb)) =>
      if (ka < kb) assert(a >= b, "a higher cutoff cannot admit more edges")
    }
  }

  test("q65 Pareto: last cumulative share covers ~all revenue; classes are monotone") {
    import org.apache.spark.sql.functions._
    val rows = RelationalQueries.q65ParetoSuppliers(spark, sf)
      .orderBy("rank").collect()
    val last = rows.last
    val total = rows.map(_.getAs[Long]("revenue_cents")).sum
    assert(last.getAs[Long]("cum_cents") === total)
    // cum shares non-decreasing, classes never go C -> B -> A backwards
    val shares = rows.map(_.getAs[Long]("cum_share_ppm"))
    shares.zip(shares.tail).foreach { case (a, b) => assert(a <= b) }
    val cls = rows.map(_.getAs[String]("abc_class"))
    cls.zip(cls.tail).foreach { case (a, b) => assert(a <= b) }
  }

  test("q64 cumulative reach: final cum_users equals the distinct user count") {
    import org.apache.spark.sql.functions._
    val rows = TemporalQueries.q64CumulativeUsers(spark, sf).orderBy("day").collect()
    val users = graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.last.getAs[Long]("cum_users") === users)
    assert(rows.map(_.getAs[Long]("new_users")).sum === users)
    rows.foreach { r =>
      assert(r.getAs[Long]("active_users") >= r.getAs[Long]("new_users"))
    }
  }

  test("q66 transition matrix: rows sum to the per-from totals; count conservation") {
    import org.apache.spark.sql.functions._
    val tr = TemporalQueries.q66EventTransitions(spark, sf)
    val transitions = tr.agg(sum("n")).first().getLong(0)
    val ev = graft.core.Tables.events(spark, sf)
    val perUser = ev.groupBy("user_id").count()
    val expected = perUser.agg(sum(col("count") - 1)).first().getLong(0)
    assert(transitions === expected,
      "each user with c events contributes exactly c-1 transitions")
  }

  test("d25 snapshot diff conserves both snapshots") {
    import org.apache.spark.sql.functions._
    val diff = DedupQueries.d25SnapshotDiff(spark, sf)
    def tot(statuses: String*): Long =
      diff.where(col("status").isin(statuses: _*))
        .agg(coalesce(sum("n"), lit(0L))).first().getLong(0)
    val docs = graft.core.Tables.documents(spark, sf)
    val oldN = docs.where(expr("doc_id % 7 != 0")).count()
    val newN = docs.where(expr("doc_id % 5 != 0")).count()
    assert(tot("removed", "changed", "unchanged") === oldN)
    assert(tot("added", "changed", "unchanged") === newN)
  }

  test("g27 MIS: independent, dominating on decided vertices, silent on undecided") {
    import org.apache.spark.sql.functions._
    val mis = GraphQueries.g27Mis(spark, sf)
    val edges = graft.graph.PropertyGraph.symmetrize(
      GraphQueries.partPairsMaterialized(spark, sf)).select("src", "dst")
    val inMis = mis.where(col("in_mis")).select(col("id"))
    assert(inMis.count() > 0)
    // independence: no edge joins two MIS vertices
    val violations = edges
      .join(inMis.select(col("id").as("src")), "src")
      .join(inMis.select(col("id").as("dst")), "dst").count()
    assert(violations === 0L, "two adjacent vertices are both in the MIS")
    // domination: every decided non-MIS vertex has a MIS neighbor
    val outNoMisNbr = mis.where(col("decided") && !col("in_mis"))
      .select(col("id").as("dst"))
      .join(edges.join(inMis.select(col("id").as("src")), "src")
        .select(col("dst")).distinct(), Seq("dst"), "left_anti").count()
    assert(outNoMisNbr === 0L, "a knocked-out vertex has no MIS neighbor")
    // an undecided vertex can have no MIS neighbor (it would be out)
    val undecidedWithMisNbr = mis.where(!col("decided"))
      .select(col("id").as("dst"))
      .join(edges.join(inMis.select(col("id").as("src")), "src")
        .select(col("dst")).distinct(), Seq("dst"), "left_semi").count()
    assert(undecidedWithMisNbr === 0L)
  }

  test("m8 alignment conserves both tables") {
    import org.apache.spark.sql.functions._
    val a = MultimodalQueries.m8ModalityAlignment(spark, sf)
    val docs = graft.core.Tables.documents(spark, sf).count()
    val vecs = graft.core.Tables.embeddings(spark, sf).count()
    val src = a.where(col("source") =!= "__orphan_vectors__")
    assert(src.agg(sum("n_docs")).first().getLong(0) === docs)
    // every vector is either matched to a doc or an orphan
    val matched = src.agg(sum("n_with_vec")).first().getLong(0)
    val orphan = a.where(col("source") === "__orphan_vectors__")
      .agg(sum("n_missing_vec")).first().getLong(0)
    assert(matched + orphan === vecs)
    src.collect().foreach { r =>
      assert(r.getAs[Long]("n_with_vec") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q72 shares reconcile: nation cents sum to region cents, regions to total") {
    import org.apache.spark.sql.functions._
    val rows = RelationalQueries.q72HierarchyShares(spark, sf)
    val byRegion = rows.groupBy("region")
      .agg(sum("nation_cents").as("s"), first("region_cents").as("rc"))
      .collect()
    byRegion.foreach(r => assert(r.getLong(1) === r.getLong(2)))
    val total = rows.agg(sum("nation_cents")).first().getLong(0)
    val ordersTotal = graft.core.Tables.orders(spark, sf)
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")))
      .first().getLong(0)
    assert(total === ordersTotal,
      "every order's cents must land in exactly one nation row")
  }

  test("g28 diff statuses partition the union of both periods' tie sets") {
    import org.apache.spark.sql.functions._
    val diff = GraphQueries.g28GraphDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // persisted + new = the post-cutoff pair count; persisted + lost = pre
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    val od = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("ok"),
        (col("o_orderdate") < to_timestamp(lit("1998-01-01"))).as("old"))
    def pairCount(oldSide: Boolean): Long = {
      val x = li.join(od.where(col("old") === oldSide).select("ok"), "ok")
      x.as("a").join(x.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .select(col("a.p"), col("b.p")).distinct().count()
    }
    assert(diff.getOrElse("persisted", 0L) + diff.getOrElse("lost", 0L) === pairCount(true))
    assert(diff.getOrElse("persisted", 0L) + diff.getOrElse("new", 0L) === pairCount(false))
  }

  test("g29 locality roundtrip agrees with g19's hash roundtrip about the graph") {
    import org.apache.spark.sql.functions._
    // Two independent writer/reader pipelines over the SAME co-occurrence
    // graph: the locality-mode files (g29) and the id-mod-3 files (g19)
    // must account for identical vertex and edge-record totals, and
    // g29's relational hash-cut baseline must equal the cut g19 reads
    // back from its own files — the rows-only-gated query tied to the
    // hash-oracle-gated one.
    val g29 = GraphQueries.g29LocalityRoundtrip(spark, sf)
      .agg(sum("loc_nvtxs"), sum("loc_nedges"), max("hash_cut_total"),
        max("loc_cut_total")).first()
    val g19 = GraphQueries.g19PartitionRoundtrip(spark, sf)
      .agg(sum("nvtxs"), sum("nedges"), sum("cut_edges")).first()
    assert(g29.getLong(0) === g19.getLong(0), "vertex totals must agree")
    assert(g29.getLong(1) === g19.getLong(1), "edge-record totals must agree")
    assert(g29.getLong(2) === g19.getLong(2),
      "g29's relational id-mod-3 cut must equal the cut g19 reads from files")
    assert(g29.getLong(3) < g29.getLong(2), "locality must beat the hash cut")
  }

  test("g26 residual trace is the monotone tail of a contracting iteration") {
    val rows = GraphQueries.g26ConvergenceTrace(spark, sf).orderBy("iter").collect()
    assert(rows.length === 6)
    val res = rows.map(_.getAs[Double]("residual"))
    // PageRank on a strongly-mixing graph contracts monotonically
    res.zip(res.tail).foreach { case (a, b) => assert(b <= a + 1e-9) }
    rows.foreach { r =>
      val conv = r.getAs[Boolean]("converged")
      val v = r.getAs[Double]("residual")
      assert(conv === (v < 1e-4))
    }
  }
}
