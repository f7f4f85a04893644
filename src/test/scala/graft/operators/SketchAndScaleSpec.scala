package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Aggregators, Portable}
import graft.graph.{GraphOps, PropertyGraph}

/** Round-2 additions with non-SQL-checkable structure: the mergeable KMV
  * sketch must agree with its declarative (oracle-checked) twin, the
  * salted join must be a lossless rewrite of the plain join, and label
  * propagation must find hand-computable communities. */
class SketchAndScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("KmvDistinct Aggregator == declarative bottom-k estimate (q29)") {
    import spark.implicits._
    val kmv = udaf(new Aggregators.KmvDistinct(SketchQueries.K, Portable.P))
    val viaAgg = graft.core.Tables.lineitem(spark, sf)
      .select($"l_returnflag",
        (($"l_orderkey" * lit(2654435761L)) % lit(Portable.P)).as("h"))
      .groupBy($"l_returnflag").agg(kmv($"h").as("kmv_estimate"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaQuery = SketchQueries.q29KmvDistinct(spark, sf)
      .select($"l_returnflag", $"kmv_estimate")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg === viaQuery)
  }

  test("BottomK property: heap == row_number window on seeded random groups") {
    import spark.implicits._
    // Seeded LCG rows: 40 groups × ~200 candidates with duplicate
    // measures (tie-break on id must match the window's ORDER BY m, id).
    var seed = 424242L
    def next(n: Long): Long = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
      seed % n
    }
    val rows = (1 to 8000).map { i =>
      (next(40), next(50), i.toLong) // (group, measure-with-ties, unique id)
    }
    val df = rows.toDF("g", "m", "id").repartition(13) // force partial merges
    val k = 7
    val topk = udaf(new Aggregators.BottomK(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
    val viaHeap = df.groupBy($"g").agg(topk($"m", $"id").as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "p")))
      .select($"g", ($"pos" + 1).as("rank"), $"p.m".as("m"), $"p.id".as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"m", $"id")
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"g", $"rank", $"m", $"id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaHeap === viaWindow)
  }

  test("KMV is exact below k and within 3/sqrt(k) above") {
    import spark.implicits._
    val kmv = udaf(new Aggregators.KmvDistinct(64, Portable.P))
    // 40 distinct (< k=64): the sketch holds every hash -> exact.
    val small = (1 to 400).map(i => (i % 40).toLong).toDF("x")
      .select((($"x" * 2654435761L) % Portable.P).as("h"))
      .agg(kmv($"h")).first().getLong(0)
    assert(small === 40L)
    // 5000 distinct (>> k): estimator error ~1/sqrt(k) ≈ 12.5%.
    val big = (1 to 5000).map(_.toLong).toDF("x")
      .select((($"x" * 2654435761L) % Portable.P).as("h"))
      .agg(kmv($"h")).first().getLong(0)
    assert(math.abs(big - 5000.0) / 5000.0 < 3.0 / math.sqrt(64.0),
      s"estimate $big too far from 5000")
  }

  test("HllDistinct Aggregator == declarative register estimate (q34)") {
    import spark.implicits._
    val hll = udaf(new Aggregators.HllDistinct(SketchQueries.HllM, SketchQueries.HllMaxRho))
    val viaAgg = graft.core.Tables.lineitem(spark, sf)
      .select($"l_returnflag", expr(SketchQueries.hllHashSql("l_partkey")).as("h"))
      .groupBy($"l_returnflag").agg(round(hll($"h"), 4).as("hll_estimate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaQuery = SketchQueries.q34HllDistinct(spark, sf)
      .select($"l_returnflag", $"hll_estimate")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaAgg === viaQuery)
  }

  test("q61 register merge: 'ALL' row == direct global HLL build, flags == q34") {
    import spark.implicits._
    val rows = SketchQueries.q61HllMerge(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // per-flag rows are exactly q34's (register build shared verbatim)
    val q34 = SketchQueries.q34HllDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    q34.foreach { case (flag, v) => assert(rows(flag) === v, s"flag $flag") }
    // merged 'ALL' == the estimate of a DIRECT global register build:
    // max-merge over per-group registers is lossless for HLL.
    val li = graft.core.Tables.lineitem(spark, sf)
    val h = expr(graft.operators.SketchQueries.hllHashSql("l_partkey"))
    val direct = li.select((h % SketchQueries.HllM).as("bucket"),
        expr(s"(${SketchQueries.hllHashSql("l_partkey")}) DIV ${SketchQueries.HllM}").as("v"))
      .select($"bucket", when($"v" === 0L, lit(SketchQueries.HllMaxRho))
        .otherwise(lit(SketchQueries.HllMaxRho) - length(bin($"v"))).as("rho"))
      .groupBy($"bucket").agg(max($"rho").as("r"))
      .agg(sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), r)").cast("double")).as("occ"),
        count(lit(1)).as("nb"))
      .collect()(0)
    val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 /
      (direct.getDouble(0) + (SketchQueries.HllM - direct.getLong(1)).toDouble)
    val est = if (raw <= 2.5 * SketchQueries.HllM && direct.getLong(1) < SketchQueries.HllM)
      SketchQueries.HllM * math.log(SketchQueries.HllM.toDouble /
        (SketchQueries.HllM - direct.getLong(1)))
    else raw
    assert(rows("ALL")._2 ===
      BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("HLL estimate within 15% at 5k distinct, invariant to partitioning") {
    import spark.implicits._
    val hll = udaf(new Aggregators.HllDistinct(SketchQueries.HllM, SketchQueries.HllMaxRho))
    def estimate(parts: Int): Double =
      (1 to 5000).map(_.toLong).toDF("k").repartition(parts)
        .select(expr(SketchQueries.hllHashSql("k")).as("h"))
        .agg(hll($"h")).first().getDouble(0)
    val e1 = estimate(1); val e8 = estimate(8)
    assert(e1 === e8, "merge must be order/partitioning independent")
    assert(math.abs(e1 - 5000.0) / 5000.0 < 0.15, s"estimate $e1 too far from 5000")
  }

  test("HLL linear-counting: 50 distinct lands within 5%") {
    import spark.implicits._
    // The raw loglog estimator reads high below ~2.5m; the linear-counting
    // switch (m·ln(m/V) on V empty registers) must bring the small range
    // inside 5%, matching the declarative q34 form bit-for-bit.
    val hll = udaf(new Aggregators.HllDistinct(SketchQueries.HllM, SketchQueries.HllMaxRho))
    val est = (1 to 500).map(i => (i % 50).toLong).toDF("k").repartition(8)
      .select(expr(SketchQueries.hllHashSql("k")).as("h"))
      .agg(hll($"h")).first().getDouble(0)
    assert(math.abs(est - 50.0) / 50.0 < 0.05, s"estimate $est too far from 50")
  }

  test("HLL survives out-of-domain ids (negative / overflow-range hashes)") {
    import spark.implicits._
    val hll = udaf(new Aggregators.HllDistinct(SketchQueries.HllM, SketchQueries.HllMaxRho))
    // Snowflake-style ids: k*k overflows Long, hllHashSql goes negative.
    // Pre-fix this threw ArrayIndexOutOfBoundsException in reduce.
    val ids = (1 to 2000).map(i => 1234567890123456789L + i * 1000003L) ++
      (1 to 500).map(i => -987654321098765L - i)
    val est = ids.toDF("user_id").repartition(8)
      .select(expr(SketchQueries.hllHashSql("user_id")).as("h"))
      .agg(hll($"h")).first().getDouble(0)
    assert(est > 0.0 && !est.isNaN)
    // In-domain behavior unchanged: sign-bit mask and rho floor are no-ops
    // for hashes in [0, P) — the q34 parity test above still pins that.
  }

  test("CmsSketch Aggregator cells == declarative counter table (q35)") {
    import spark.implicits._
    val cms = new Aggregators.CmsSketch(SketchQueries.CmsD, SketchQueries.CmsW.toInt,
      SketchQueries.CmsA, (0 until SketchQueries.CmsD).map(SketchQueries.cmsB))
    val ev = graft.core.Tables.events(spark, sf).select($"user_id")
    val cmsUdaf = udaf(cms)
    val counts = ev.repartition(8).agg(cmsUdaf($"user_id")).first()
      .getSeq[Long](0)
    // Declarative twin: the q35 posexplode counter table.
    val cells = array((0 until SketchQueries.CmsD).map(r =>
      expr(SketchQueries.cmsBucketSql("user_id", r))): _*)
    val declared = ev.select(posexplode(cells).as(Seq("r", "bucket")))
      .groupBy($"r", $"bucket").agg(count(lit(1)).as("cnt"))
      .collect().map(x => (x.getInt(0), x.getLong(1).toInt) -> x.getLong(2)).toMap
    val w = SketchQueries.CmsW.toInt
    for (r <- 0 until SketchQueries.CmsD; b <- 0 until w)
      assert(counts(r * w + b) === declared.getOrElse((r, b), 0L),
        s"cell ($r,$b) mismatch")
  }

  test("CMS never undercounts and is exact at this load factor's scale") {
    import spark.implicits._
    val est = SketchQueries.q35CmsTopk(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(est.nonEmpty)
    est.foreach { case (exact, cms, over) =>
      assert(cms >= exact, "CMS must never undercount")
      assert(over === cms - exact)
    }
  }

  test("CMS property: never undercounts on seeded random multisets") {
    import spark.implicits._
    import org.scalacheck.{Gen, rng}
    val cms = new Aggregators.CmsSketch(SketchQueries.CmsD, SketchQueries.CmsW.toInt,
      SketchQueries.CmsA, (0 until SketchQueries.CmsD).map(SketchQueries.cmsB))
    val cmsUdaf = udaf(cms)
    val genKeys: Gen[List[Long]] = Gen.nonEmptyListOf(Gen.choose(-5000L, 5000L))
    (1 to 5).foreach { i =>
      genKeys(Gen.Parameters.default.withSize(300), rng.Seed(i.toLong)).foreach { keys =>
        val counts = spark.createDataset(keys).toDF("k").repartition(5)
          .agg(cmsUdaf($"k")).first().getSeq[Long](0)
        val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
        exact.foreach { case (k, n) =>
          assert(cms.estimate(counts, k) >= n,
            s"seed $i key $k: estimate ${cms.estimate(counts, k)} < exact $n")
        }
      }
    }
  }

  test("histogram quantile sketch (q36): within-bin bound and monotone") {
    import spark.implicits._
    // The exact percentiles are computed HERE, not in the gated query:
    // percentile() is a SortAggregate buffering every value per group —
    // fine at spec SF, the anti-pattern the sketch replaces at scale.
    val exact = graft.core.Tables.lineitem(spark, sf).groupBy($"l_returnflag").agg(
      percentile($"l_extendedprice", lit(0.5)).as("e50"),
      percentile($"l_extendedprice", lit(0.9)).as("e90"),
      percentile($"l_extendedprice", lit(0.99)).as("e99"))
    val rows = SketchQueries.q36HistQuantiles(spark, sf)
      .join(exact, "l_returnflag")
      .select($"hist_p50", $"e50", $"hist_p90", $"e90", $"hist_p99", $"e99")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h50, e50) = (r.getDouble(0), r.getDouble(1))
      val (h90, e90) = (r.getDouble(2), r.getDouble(3))
      val (h99, e99) = (r.getDouble(4), r.getDouble(5))
      // Estimate = the target rank's bin LOWER bound: the rank's order
      // stat lives in [h, 2h); the interpolated exact can sit one order
      // stat away, so assert the loose two-sided factor bound.
      Seq((h50, e50), (h90, e90), (h99, e99)).foreach { case (h, e) =>
        assert(h * 100.0 == math.pow(2, math.round(math.log(h * 100.0) / math.log(2.0))),
          s"estimate $h is not a power-of-two bin bound")
        assert(e / h > 0.5 && e / h < 2.5, s"estimate $h too far from exact $e")
      }
      assert(h50 <= h90 && h90 <= h99, "quantile estimates must be monotone")
    }
  }

  test("salted join (q31) == plain join (lossless rewrite)") {
    import spark.implicits._
    val salted = RelationalQueries.q31SaltedJoin(spark, sf).collect()
    val li = graft.core.Tables.lineitem(spark, sf)
    val supp = graft.core.Tables.supplier(spark, sf)
    val plain = li.join(supp, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_suppkey", $"s_name")
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100 + 0.5)
          .cast("long")).as("cents"),
        count(lit(1)).as("n_items"))
      .select($"s_suppkey", $"s_name",
        round($"cents" / 100.0, 2).as("revenue"), $"n_items")
      .orderBy($"s_suppkey").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("kCore: pendant chain peels in cascading rounds, clique survives") {
    import spark.implicits._
    // K4 clique {0,1,2,3} (3-core); 4 hangs off 2 and 3 plus leaf 5
    // (deg 3). Round 1 peels 5 (deg 1); that drops 4 to deg 2 → peeled
    // round 2 — a genuine cascade. The clique survives.
    val pairs = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 2L, 1L -> 3L,
      2L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 5L).toDF("src", "dst")
    val out = GraphOps.kCore(PropertyGraph.symmetrize(pairs), k = 3, rounds = 6)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out === Map(
      0L -> ((true, 0L)), 1L -> ((true, 0L)), 2L -> ((true, 0L)), 3L -> ((true, 0L)),
      5L -> ((false, 1L)), 4L -> ((false, 2L))))
  }

  test("label propagation: two triangles joined by a bridge -> two communities") {
    import spark.implicits._
    // Triangle A = {0,1,2}, triangle B = {10,11,12}, bridge 2-10.
    val pairs = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L,
      10L -> 11L, 10L -> 12L, 11L -> 12L, 2L -> 10L)
      .toDF("src", "dst")
    val g = PropertyGraph.fromEdges(PropertyGraph.symmetrize(pairs))
    val labels = GraphOps.labelPropagation(g, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Each triangle collapses to one label; the bridge does not merge them.
    assert(Set(labels(0L), labels(1L), labels(2L)).size === 1)
    assert(Set(labels(10L), labels(11L), labels(12L)).size === 1)
    assert(labels(0L) !== labels(10L))
  }

  test("grouping sets (q30): component groupings match independent group-bys") {
    import spark.implicits._
    val gs = RelationalQueries.q30GroupingSets(spark, sf)
    val byStatus = gs.where($"priority" === "ALL" && $"status" =!= "ALL")
      .select($"status", $"n_orders")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = graft.core.Tables.orders(spark, sf)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus === direct)
    val grand = gs.where($"priority" === "ALL" && $"status" === "ALL")
      .select($"n_orders").first().getLong(0)
    assert(grand === direct.values.sum)
  }
}
