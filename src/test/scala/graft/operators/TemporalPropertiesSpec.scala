package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the sweep-line kernels (the
  * GraphPropertiesSpec pattern: seeded ScalaCheck generators, small
  * sizes — each case runs real Spark jobs). Fixture specs pin the gated
  * queries; these pin the KERNELS on arbitrary interval sets, where the
  * adversarial cases live (identical starts, nested intervals, exact
  * touching, zero length). */
class TemporalPropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(14), Seed(i.toLong))
        .foreach(body)
    }

  /** Random interval sets over a tiny coordinate space — collisions,
    * nesting, touching and zero-length intervals all occur. */
  private val genIntervals: Gen[List[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(1L, 3L)
      st <- Gen.choose(0L, 30L)
      len <- Gen.choose(0L, 12L)
    } yield (k, st, st + len)).map(_.take(20))

  test("overlapPeak == brute-force point-in-interval maximum") {
    import spark.implicits._
    forAll(genIntervals) { ivs =>
      val df = ivs.zipWithIndex
        .map { case ((k, st, en), i) => (k, i.toLong, st, en) }
        .toDF("key", "seq", "st", "en")
      val got = TemporalQueries.overlapPeak(df.select($"key", $"st", $"en"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      ivs.groupBy(_._1).foreach { case (k, ks) =>
        // brute force: concurrency at instant t = #{[st, en) : st <= t < en},
        // evaluated at every boundary; peak + earliest argmax.
        val bounds = ks.flatMap(t => Seq(t._2, t._3)).distinct.sorted
        val curve = bounds.map(t =>
          t -> ks.count(iv => iv._2 <= t && t < iv._3).toLong)
        val peak = curve.map(_._2).max
        val at = curve.filter(_._2 == peak).map(_._1).min
        assert(got(k) === ((peak, at)), s"key $k: ${curve.mkString(",")}")
      }
    }
  }

  test("mergeIntervals covers inputs exactly: disjoint spans, full accounting") {
    import spark.implicits._
    forAll(genIntervals) { ivs =>
      val df = ivs.zipWithIndex
        .map { case ((k, st, en), i) => (k, i.toLong, st, en) }
        .toDF("key", "seq", "st", "en")
      val got = TemporalQueries.mergeIntervals(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      ivs.groupBy(_._1).foreach { case (k, ks) =>
        val spans = got.filter(_._1 == k).sortBy(_._2)
        // every interval inside exactly one span
        ks.foreach { case (_, st, en) =>
          assert(spans.count(s => s._2 <= st && en <= s._3) === 1,
            s"interval [$st,$en) not covered exactly once by ${spans.mkString(",")}")
        }
        // spans strictly separated (a touching pair should have merged)
        spans.sliding(2).foreach {
          case Array(a, b) => assert(a._3 < b._2, s"adjacent spans touch: $a $b")
          case _ => ()
        }
        // event counts account for every interval
        assert(spans.map(_._4).sum === ks.length.toLong)
        // each span's boundaries are realized by member intervals
        spans.foreach { s =>
          val members = ks.filter(iv => s._2 <= iv._2 && iv._3 <= s._3)
          assert(members.map(_._2).min === s._2)
          assert(members.map(_._3).max === s._3)
        }
      }
    }
  }
}
