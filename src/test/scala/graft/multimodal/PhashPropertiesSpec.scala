package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the m6 perceptual-hash kernels (the
  * TemporalPropertiesSpec pattern: seeded generators, small sizes). The
  * fixture specs pin the gated query; these pin the KERNELS where the
  * adversarial inputs live: near-collided hash populations for the
  * banding (pigeonhole completeness is a THEOREM for hamming ≤ bands-1 —
  * these check the implementation), and window-local payload edits for
  * the hash (locality is what makes near-dup payloads near in hamming).
  */
class PhashPropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(14), Seed(i.toLong))
        .foreach(body)
    }

  /** Hash populations with planted near-collisions: random 60-bit bases,
    * then variants at hamming 1..6 of earlier entries — pairs straddle
    * the <= 3 frontier from both sides. */
  private val genHashes: Gen[List[Long]] = for {
    bases <- Gen.nonEmptyListOf(Gen.choose(0L, (1L << 60) - 1)).map(_.take(8))
    variants <- Gen.listOfN(8, for {
      b <- Gen.oneOf(bases)
      nf <- Gen.choose(1, 6)
      flips <- Gen.listOfN(nf, Gen.choose(0, 59))
    } yield flips.foldLeft(b)((h, j) => h ^ (1L << j)))
  } yield bases ++ variants

  test("bandedPairs(bits=60) == all-pairs popcount filter on planted collisions") {
    import spark.implicits._
    forAll(genHashes) { hs =>
      val fps = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("id", "simhash")
      val got = graft.dedup.SimHash.bandedPairs(fps, bands = 4, maxHamming = 3,
          bits = 60)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = (for {
        (ha, ia) <- hs.zipWithIndex; (hb, ib) <- hs.zipWithIndex
        if ia < ib
        hd = java.lang.Long.bitCount(ha ^ hb)
        if hd <= 3
      } yield (ia.toLong, ib.toLong, hd.toLong)).toSet
      assert(got === expect)
    }
  }

  /** Random ASCII payload + an edit confined to one 1/60th window. */
  private val genEditedPayload: Gen[(String, String)] = for {
    n <- Gen.choose(60, 600)
    chars <- Gen.listOfN(n, Gen.choose(32, 126))
    w <- Gen.choose(0, 59)
    c <- Gen.choose(33, 125)
  } yield {
    val base = chars.map(_.toChar).mkString
    val wsz = (n + 59) / 60
    val pos = math.min(w * wsz, n - 1)
    (base, base.updated(pos, c.toChar))
  }

  test("perceptualHash locality: a single-window edit flips at most one bit") {
    import spark.implicits._
    forAll(genEditedPayload) { case (a, b) =>
      val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
      val hs = Media.perceptualHash(Media.mediaFromText(docs, "doc_id", "text"))
        .collect().map(h => h.media_id -> h.phash).toMap
      assert(java.lang.Long.bitCount(hs(0L) ^ hs(1L)) <= 1,
        s"edit in one window flipped >1 bit (len=${a.length})")
    }
  }
}
