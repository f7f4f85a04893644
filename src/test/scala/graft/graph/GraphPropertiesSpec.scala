package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.4): structural laws that must
  * hold on arbitrary graphs, not just golden fixtures. ScalaCheck
  * generators are sampled with fixed seeds (the scalatest-scalacheck
  * bridge isn't in the offline dep set, and seeded cases are
  * reproducible); sizes stay small — each case runs real Spark jobs. */
class GraphPropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  /** Five deterministic samples of a generator. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(12), Seed(i.toLong))
        .foreach(body)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => body(a, b) }

  private val genEdges: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L) if a != b
    } yield (a, b)).map(_.distinct)

  private def graphOf(pairs: List[(Long, Long)]): PropertyGraph = {
    import spark.implicits._
    // canonical distinct pairs → symmetrized undirected view
    val canon = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    PropertyGraph.fromEdges(PropertyGraph.symmetrize(canon.toDF("src", "dst")))
  }

  test("degree sum equals 2|E| on the undirected view") {
    forAll(genEdges) { pairs =>
      val canon = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val g = graphOf(pairs)
      val degSum = g.degrees.agg(org.apache.spark.sql.functions.sum("deg"))
        .first().getLong(0)
      assert(degSum === 2L * canon.size)
    }
  }

  test("PageRank ranks sum to ~1 at any iteration count") {
    forAll(genEdges, Gen.choose(1, 6)) { (pairs, iters) =>
      val ranks = PageRank(graphOf(pairs)).fixed(iters)
        .collect().map(_.getDouble(1))
      assert(math.abs(ranks.sum - 1.0) < 1e-9)
    }
  }

  test("converged SSSP satisfies the triangle inequality on every edge") {
    forAll(genEdges) { pairs =>
      val g = graphOf(pairs)
      val dist = GmrRunner.run(g, new Sssp(pairs.head._1)).vertices
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) Double.PositiveInfinity else r.getDouble(1))).toMap
      g.edges.select("src", "dst").collect().foreach { e =>
        val (s, d) = (e.getLong(0), e.getLong(1))
        assert(dist(d) <= dist(s) + 1.0 + 1e-9, s"edge $s->$d violates relaxation")
      }
    }
  }

  test("SampleSort (orderBy) equals in-memory sort on arbitrary longs") {
    forAll(Gen.nonEmptyListOf(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))) { xs =>
      import spark.implicits._
      val sorted = graft.io.SampleSort.sort(xs.toDF("n"), "n")
        .collect().map(_.getLong(0)).toList
      assert(sorted === xs.sorted)
    }
  }

  test("triangle count is invariant across all three formulations") {
    forAll(genEdges) { pairs =>
      import spark.implicits._
      val canon = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("src", "dst")
      val naive = GraphOps.triangleCount(canon)
      assert(GraphOps.triangleCountViaIntersect(canon).first().getLong(0) === naive)
      assert(GraphOps.orientedTriangleCountDF(canon).first().getLong(0) === naive)
    }
  }

  test("kCore matches local reference peeling for k in 1..4") {
    forAll(genEdges, Gen.choose(1, 4)) { (pairs, k) =>
      import spark.implicits._
      val canon = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val adj = canon.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // local reference: peel round-by-round to fixpoint
      var alive = adj.keySet
      var peeled = Map.empty[Long, Long]
      var round = 1L
      var changed = true
      while (changed) {
        val drop = alive.filter(v => adj(v).count(alive) < k)
        changed = drop.nonEmpty
        peeled ++= drop.map(_ -> round)
        alive --= drop
        round += 1
      }
      val rounds = 8 // ≥ any fixpoint depth on 12-vertex samples
      val got = GraphOps.kCore(
          PropertyGraph.symmetrize(canon.toDF("src", "dst")), k, rounds)
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
      val want = adj.keySet.map(v =>
        v -> ((!peeled.contains(v), peeled.getOrElse(v, 0L)))).toMap
      assert(got === want, s"k=$k pairs=$canon")
    }
  }

  test("lubyMis matches a local replay of the tournament, isolated vertices included") {
    def charHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % graft.functions.Portable.P)
    forAll(genEdges) { pairs =>
      import spark.implicits._
      val vs = (1L to 12L).toSet // includes isolated vertices (instant winners)
      val canon = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val adj = canon.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        .withDefaultValue(Set.empty[Long])
      val rounds = 3
      // local reference: identical salted-hash tournament
      var st = vs.map(_ -> 'a').toMap
      var rj = Map.empty[Long, Long]
      for (r <- 1 to rounds) {
        val active = st.filter(_._2 == 'a').keySet
        val key = active.map(v =>
          v -> (charHash(s"${v}mis$r") * GraphOps.MisShift + v)).toMap
        val winners = active.filter(v =>
          adj(v).intersect(active).forall(u => key(v) > key(u)))
        st = st ++ winners.map(_ -> 'm')
        rj = rj ++ winners.map(_ -> r.toLong)
        val knocked = winners.flatMap(adj).filter(u => st(u) == 'a')
        st = st ++ knocked.map(_ -> 'o')
      }
      val want = vs.map(v =>
        v -> ((st(v) == 'm', st(v) != 'a', rj.getOrElse(v, -1L)))).toMap
      val got = GraphOps.lubyMis(
          vs.toSeq.toDF("id"),
          PropertyGraph.symmetrize(canon.toDF("src", "dst")), rounds)
        .collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getLong(3))))
        .toMap
      assert(got === want, s"pairs=$canon")
    }
  }
}
