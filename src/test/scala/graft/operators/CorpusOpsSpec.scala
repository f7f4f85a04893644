package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 corpus-pipeline gates: the Bloom decontamination path must be
  * a lossless (no-false-negative) rewrite of d7's exact broadcast gate,
  * and the content-hash split must be duplicate-consistent. */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("d9 Bloom gate: n_verified == d7 n_shared (no false negatives)") {
    val exact = DedupQueries.d7Decontaminate(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = DedupQueries.d9BloomDecontaminate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bloom.map(_._1).toSet === exact.keySet)
    bloom.foreach { case (id, nCand, nVer, nFp) =>
      assert(nVer === exact(id), s"doc $id: bloom verified differs from exact")
      assert(nCand >= nVer, s"doc $id: candidates must cover verified")
      assert(nFp === nCand - nVer)
    }
  }

  test("t18 JSONL roundtrip is lossless on hostile payloads") {
    import spark.implicits._
    // quotes, backslashes, newlines, tabs, unicode, emptiness — every
    // class a JSON escape can mangle
    val hostile = Seq(
      (1L, "plain text"), (2L, "with \"double quotes\" inside"),
      (3L, "back\\slash and tab\there"), (4L, "two\nlines\nhere"),
      (5L, "unicode: café 中文 😀"), (6L, ""),
      (7L, "{\"json\": \"looking\", \"n\": 1}"))
      .toDF("doc_id", "text")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_t18_hostile"
    hostile.write.mode("overwrite").json(dir)
    val back = spark.read.schema("doc_id BIGINT, text STRING").json(dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    hostile.collect().foreach { r =>
      assert(back(r.getLong(0)) === r.getString(1), s"doc ${r.getLong(0)}")
    }
  }

  test("d23 overlap score: consistent with d7's gate, ppm exact and bounded") {
    val d7 = DedupQueries.d7Decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val rows = DedupQueries.d23OverlapScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet === d7.keySet) // same training population
    rows.foreach { case (id, nTotal, nShared, ppm) =>
      assert(nShared === d7(id)._1, s"doc $id n_shared") // d7's count verbatim
      assert(nShared <= nTotal, s"doc $id shared>total")
      assert(ppm >= 0L && ppm <= 1000000L, s"doc $id ppm range")
      if (nTotal > 0) assert(ppm === nShared * 1000000L / nTotal, s"doc $id ppm")
      else assert(ppm === 0L)
    }
    // the report is non-degenerate at spec SF: both clean and overlapping docs
    assert(rows.exists(_._4 > 0) && rows.exists(_._4 === 0L))
  }

  test("g13 link prediction matches a local common-neighbor reference") {
    val allPairs = GraphQueries.partPairsMaterialized(spark, sf)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val te = GraphQueries.partPairsMaterialized(spark, sf)
      .where(org.apache.spark.sql.functions.col("weight") >= 2.0)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    te.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    // "Existing link" = adjacency at ANY co-purchase weight, not just the
    // strong ties the wedges run on.
    val edgeSet = allPairs.toSet
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val expected = (for {
      (a, na) <- adj.toSeq
      c <- na; b <- adj(c) if a < b && !edgeSet((a, b))
    } yield ((a, b), c)).groupBy(_._1).collect {
      case ((a, b), ws) if ws.size >= 2 =>
        (a, b) -> ((ws.size.toLong, ws.map(w => 1000000L / deg(w._2)).sum))
    }.toMap
    val got = GraphQueries.g13LinkPredict(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }

  test("g15 embeddedness matches a local neighborhood-jaccard reference") {
    val te = GraphQueries.partPairsMaterialized(spark, sf)
      .where(org.apache.spark.sql.functions.col("weight") >= 2.0)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    te.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val expected = te.toSeq.sorted.map { case (a, b) =>
      val common = (adj(a) & adj(b)).size.toLong
      val union = adj(a).size + adj(b).size - common
      (a, b, common, adj(a).size.toLong, adj(b).size.toLong,
        1000000L * common / union)
    }
    val got = GraphQueries.g15Embeddedness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    // the fixture must exercise both regimes
    assert(got.exists(_._3 == 0), "no local bridges in fixture")
    assert(got.exists(_._3 > 0), "no embedded ties in fixture")
  }

  test("g16 modularity: partition invariants and a local contribution check") {
    val cp = GraphQueries.partPairsMaterialized(spark, sf)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = cp.length.toLong
    val rows = GraphQueries.g16Modularity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nVerts = cp.flatMap(e => Seq(e._1, e._2)).distinct.length.toLong
    assert(rows.map(_._2).sum === nVerts, "communities must partition the vertex set")
    assert(rows.map(_._3).sum <= m, "intra edges cannot exceed all edges")
    assert(rows.map(_._4).sum === 2 * m, "degree mass must sum to 2m")
    rows.foreach { case (_, _, eIn, dTot, contrib) =>
      assert(contrib === 4 * m * eIn - dTot * dTot)
    }
    // Q in (-1, 1]: Σcontrib / 4m² is a sane modularity value
    val q = rows.map(_._5).sum.toDouble / (4.0 * m * m)
    assert(q > -1.0 && q <= 1.0, s"modularity $q out of range")
  }

  test("g17 clustering coefficient matches a local adjacency-set reference") {
    val te = GraphQueries.partPairsMaterialized(spark, sf)
      .where(org.apache.spark.sql.functions.col("weight") >= 2.0)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    te.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val expected = adj.keys.toSeq.sorted.map { v =>
      val nb = adj(v)
      val tri = nb.toSeq.map(u => (adj(u) & nb).size.toLong).sum / 2
      val dg = nb.size.toLong
      val cc = if (dg >= 2) 2000000L * tri / (dg * (dg - 1)) else 0L
      (v, dg, tri, cc)
    }
    val got = GraphQueries.g17ClusteringCoeff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("s8 filtered ANN: neighbors always share the query's label") {
    val labels = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SimilarityQueries.s8AnnFiltered(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, nb) =>
      assert(labels(nb) === labels(q), s"query $q (label ${labels(q)}) got neighbor $nb (label ${labels(nb)})")
    }
    // ranks are 1..k per query with no gaps
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq, s"rank gap for query $q")
    }
  }

  test("s10 MMR: rank-1 is pure relevance argmax; later ranks are penalized picks") {
    val rows = SimilarityQueries.s10Mmr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq === (1L to byRank.length).toSeq, s"rank gap for query $q")
      // rank 1: score == rel (no penalty yet). Later ranks: score =
      // rel − max-sim-to-selected, where the penalty term lives in
      // [−10⁶, 10⁶] (an anti-correlated pool can push score ABOVE rel —
      // that is MMR's diversity bonus, not a bug).
      assert(byRank.head._4 === byRank.head._5, s"query $q rank-1 penalized")
      byRank.tail.foreach { r =>
        assert(math.abs(r._5 - r._4) <= 1000000L,
          s"query $q rank ${r._2}: |score − rel| outside the cosine range")
      }
      // rank 1 must carry the pool's max relevance
      assert(byRank.head._4 === rs.map(_._4).max, s"query $q rank-1 not max-rel")
    }
    // diversification must bite somewhere: some query's selection order
    // deviates from pure relevance order
    val deviates = rows.groupBy(_._1).exists { case (_, rs) =>
      val byRank = rs.sortBy(_._2).map(_._3)
      val byRel = rs.sortBy(r => (-r._4, r._3)).map(_._3)
      byRank.toSeq !== byRel.toSeq
    }
    assert(deviates, "MMR == pure top-k everywhere — diversification untested")
  }

  test("g18 k-truss matches a local fixed-round peeling reference") {
    val te = GraphQueries.partPairsMaterialized(spark, sf)
      .where(org.apache.spark.sql.functions.col("weight") >= 2.0)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    var e = te.toSet
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    (1 to 4).foreach { _ =>
      val sup = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      for {
        ab @ (a, b) <- e; (b2, c) <- e if b2 == b && e((a, c))
      } { sup(ab) += 1; sup((b, c)) += 1; sup((a, c)) += 1 }
      e = e.filter(sup(_) >= 1)
      snapshots += e
    }
    val m = te.map(ed => ed -> snapshots.count(_(ed)).toLong).toMap
    val expected = te.toSeq.sorted.map { ed =>
      (ed._1, ed._2, m(ed) == 4L, if (m(ed) == 4L) 0L else m(ed) + 1)
    }
    val got = GraphQueries.g18KTruss(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.exists(_._3) && got.exists(!_._3), "fixture must peel some edges and keep some")
  }

  test("g14 betweenness matches a local Brandes reference") {
    val te = GraphQueries.partPairsMaterialized(spark, sf)
      .where(org.apache.spark.sql.functions.col("weight") >= 2.0)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    te.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    val verts = adj.keys.toArray.sorted
    val bc = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    verts.take(5).foreach { s =>
      // Brandes single-source: BFS orders, sigma counts, delta back-prop
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L).withDefaultValue(0L)
      val order = scala.collection.mutable.ArrayBuffer.empty[Long]
      val queue = scala.collection.mutable.Queue(s)
      while (queue.nonEmpty) {
        val u = queue.dequeue(); order += u
        adj(u).foreach { v =>
          if (!dist.contains(v)) { dist(v) = dist(u) + 1; queue.enqueue(v) }
          if (dist(v) == dist(u) + 1) sigma(v) += sigma(u)
        }
      }
      val delta = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      order.reverseIterator.foreach { w =>
        adj(w).foreach { v =>
          if (dist.contains(v) && dist(v) == dist(w) - 1)
            delta(v) += sigma(v).toDouble / sigma(w) * (1.0 + delta(w))
        }
        if (w != s) bc(w) += delta(w)
      }
    }
    val got = GraphQueries.g14Betweenness(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === verts.toSet)
    verts.foreach { v =>
      assert(math.abs(got(v) - bc(v)) < 1e-4,
        s"vertex $v: engine ${got(v)} vs local ${bc(v)}")
    }
  }

  test("d10 source mix: rates in range, verdict consistent with draw, per-source") {
    val rows = DedupQueries.d10SourceMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, pct, draw, kept) =>
      assert(pct >= 25 && pct < 100, s"keep_pct $pct out of range")
      assert(draw >= 0 && draw < 100)
      assert(kept === (draw < pct))
    }
    // One rate per source, and at least one source down-weighted (< 100%).
    val bySource = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
    assert(bySource.values.forall(_.size == 1), "a source must have ONE rate")
    assert(bySource.values.exists(_.head < 100L))
  }

  test("t9 split: byte-identical docs land in the same split, fractions sane") {
    import spark.implicits._
    val out = TextQueries.t9Split(spark, sf)
    val byText = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val split = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // Same text → same bucket → same split (the property an id-hash split lacks).
    byText.groupBy(_._2).values.filter(_.size > 1).foreach { dups =>
      val assignments = dups.keys.map(split).toSet
      assert(assignments.size === 1, s"dup group straddles splits: $assignments")
    }
    split.values.foreach { case (b, s) =>
      assert(b >= 0 && b < 100)
      assert(s === (if (b < 90) "train" else if (b < 95) "val" else "test"))
    }
    // Roughly 90/5/5: train must dominate (loose bound; hash is uniform-ish).
    val n = split.size.toDouble
    val nTrain = split.values.count(_._2 == "train")
    assert(nTrain / n > 0.75, s"train fraction ${nTrain / n} implausibly low")
  }

  test("q55 MAD outliers matches a local robust-stats reference") {
    val rows = graft.core.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, vs) =>
      val d2 = vs.map(v => math.floor(v._2 * 100 + 0.5) * 2)
      val med2 = median(d2)
      val dev = d2.map(x => math.abs(x - med2))
      val mad2 = median(dev)
      (g, med2 / 2, mad2 / 2, vs.length.toLong,
        dev.count(_ > 3 * mad2).toLong)
    }
    val got = RelationalQueries.q55MadOutliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.exists(_._5 > 0), "fixture has no outliers — threshold untested")
  }

  test("d19 weighted sample: k smallest weight-scaled priorities per source") {
    import org.apache.spark.sql.functions._
    val all = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"),
        graft.functions.Portable.charHash(concat(col("text"), lit("wsamp1"))).as("draw"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = all.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.map(t => (src, t._2, t._4 / math.max(t._3, 1L)))
        .sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((s0, id, p), i) => (s0, i + 1L, id, p) }
    }.sortBy(t => (t._1, t._2))
    val got = DedupQueries.d19WeightedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // weighting must actually matter: the uniform (unweighted) draw on the
    // same salt picks a different sample for at least one source
    val uniform = all.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.map(t => (src, t._2, t._4)).sortBy(t => (t._3, t._2)).take(3).map(_._2)
    }.toSet
    assert(got.map(_._3).toSet !== uniform, "weighted sample == uniform sample")
  }

  test("t14 LM score matches a local bigram-model reference") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val grams = docs.flatMap { case (id, ws) => ws.sliding(2).filter(_.size == 2)
      .map(p => (id, p.mkString(" "))) }
    val c2 = grams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1.split(" ")(0)).view.mapValues(_.values.sum).toMap
    val expected = grams.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, gs) =>
      val ppms = gs.map { case (_, g) => c2(g) * 1000000L / c1(g.split(" ")(0)) }
      (id, gs.size.toLong, ppms.sum, ppms.sum / gs.size)
    }
    val got = TextQueries.t14LmScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("t15 phrase search matches a local positional scan") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val expected = docs.flatMap { case (id, ws) =>
      val hits = (0 until ws.length - 1)
        .filter(i => ws(i) == "table" && ws(i + 1) == "scan")
      if (hits.isEmpty) None else Some((id, hits.size.toLong, hits.min + 1L))
    }.sortBy(_._1).toSeq
    val got = TextQueries.t15PhraseSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "phrase absent from fixture — query untested")
  }

  test("g20 HITS matches a local unrolled reference") {
    val cp = GraphQueries.partPairsMaterialized(spark, sf)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val verts = cp.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val scale = 1000000L
    var hub = verts.map(_ -> scale).toMap
    var auth = verts.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val ar = cp.groupBy(_._2).view.mapValues(_.map(e => hub(e._1)).sum).toMap
      val am = ar.values.max
      auth = verts.map(v => v -> ar.get(v).map(r => r * scale / am).getOrElse(0L)).toMap
      val hr = cp.groupBy(_._1).view.mapValues(_.map(e => auth(e._2)).sum).toMap
      val hm = hr.values.max
      hub = verts.map(v => v -> hr.get(v).map(r => r * scale / hm).getOrElse(0L)).toMap
    }
    val got = GraphQueries.g20Hits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === verts.map(v => (v, hub(v), auth(v))).toSeq)
    // the DAG orientation must actually split the roles
    assert(got.exists(r => r._2 != r._3), "hub == auth everywhere — roles collapsed")
  }

  test("g21 harmonic closeness matches a local BFS reference") {
    val te = GraphQueries.partPairsMaterialized(spark, sf)
      .where(org.apache.spark.sql.functions.col("weight") >= 2.0)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    te.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val verts = adj.keys.toSeq.sorted
    val srcs = verts.take(5)
    def bfs(s0: Long): Map[Long, Int] = {
      var d = Map(s0 -> 0); var frontier = Set(s0)
      for (h <- 1 to 12) {
        frontier = frontier.flatMap(adj).filterNot(d.contains)
        d ++= frontier.map(_ -> h)
      }
      d
    }
    val dists = srcs.map(bfs)
    val expected = verts.map { v =>
      val ds = dists.flatMap(_.get(v)).filter(_ > 0)
      (v, ds.size.toLong, ds.map(1000000L / _).sum)
    }
    val got = GraphQueries.g21Harmonic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q54 transitive closure matches a local bounded-BFS reference") {
    val te = GraphQueries.partPairsMaterialized(spark, sf)
      .where(org.apache.spark.sql.functions.col("weight") >= 2.0)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    te.foreach { case (a, b) => out(a) += b }
    val seeds = te.map(_._1).distinct.sorted.take(5)
    val expected = seeds.flatMap { s0 =>
      var d = Map(s0 -> 0); var frontier = Set(s0)
      for (h <- 1 to 4) {
        frontier = frontier.flatMap(out).filterNot(d.contains)
        d ++= frontier.map(_ -> h)
      }
      d.toSeq.filter(_._2 >= 1).map { case (n, h) => (s0, n, h.toLong) }
    }.sortBy(t => (t._1, t._2))
    val got = GraphQueries.q54TransitiveClosure(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.exists(_._3 > 1), "fixture closure never leaves hop 1 — seeds trivial")
  }

  test("g22 assortativity matches local degree moments") {
    val pairs = GraphQueries.partPairsMaterialized(spark, sf)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dir = pairs ++ pairs.map(_.swap)
    val deg = dir.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
    val m2 = dir.length.toLong
    val sumJk = dir.map { case (a, b) => deg(a) * deg(b) }.sum
    val sumJ = dir.map { case (a, _) => deg(a) }.sum
    val sumJ2 = dir.map { case (a, _) => deg(a) * deg(a) }.sum
    val r = GraphQueries.g22Assortativity(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((m2, sumJk, sumJ, sumJ2)))
    assert(r.getLong(4) === m2 * sumJk - sumJ * sumJ)
    assert(r.getLong(5) === m2 * sumJ2 - sumJ * sumJ)
    assert(r.getLong(5) > 0, "degenerate fixture: all degrees equal")
  }

  test("q56 overlap peak matches a local sweep-line reference") {
    val ev = graft.core.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val gap = 1800L * 1000000L
    val expected = ev.groupBy(_._1).map { case (t, es) =>
      val net = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      es.foreach { case (_, us) => net(us) += 1; net(us + gap) -= 1 }
      var cum = 0L; var peak = Long.MinValue; var peakAt = 0L
      net.toSeq.sortBy(_._1).foreach { case (us, d) =>
        cum += d
        if (cum > peak) { peak = cum; peakAt = us }
      }
      (t, peak, peakAt)
    }.toSeq.sortBy(_._1)
    val got = TemporalQueries.q56OverlapPeak(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.exists(_._2 > 1), "peak never exceeds 1 — intervals never overlap")
  }

  test("s11 binary rerank matches a local sign-bit reference") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def sig(v: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (i <- 0 until 32) { if (v(i) > 0) lo |= 1L << i }
      for (i <- 32 until 64) { if (v(i) > 0) hi |= 1L << (i - 32) }
      (lo, hi)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val sigs = vecs.map { case (id, v) => id -> sig(v) }.toMap
    val byId = vecs.toMap
    val expected = vecs.filter(_._1 < 5).sortBy(_._1).flatMap { case (q, qv) =>
      val (qlo, qhi) = sigs(q)
      val cand = vecs.filter(_._1 != q).map { case (id, _) =>
        val (lo, hi) = sigs(id)
        (id, (java.lang.Long.bitCount(lo ^ qlo) + java.lang.Long.bitCount(hi ^ qhi)).toLong)
      }.sortBy(t => (t._2, t._1)).take(50)
      cand.map { case (id, h) =>
        val c = BigDecimal(cos(qv, byId(id))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (q, id, h, c)
      }.sortBy(t => (-t._4, t._2)).take(10).zipWithIndex
        .map { case ((_, id, h, c), i) => (q, id, h, c, i + 1L) }
    }.toSeq
    val got = SimilarityQueries.s11BinaryRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("s12 index recall equals the s1/s2 set intersection") {
    val exact = SimilarityQueries.s1AnnBruteforce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val apx = SimilarityQueries.s2AnnLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val got = SimilarityQueries.s12IndexRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet === exact.keySet)
    got.foreach { case (q, nExact, nHit, ppm) =>
      assert(nExact === exact(q).size.toLong)
      val hits = exact(q).intersect(apx.getOrElse(q, Set.empty)).size.toLong
      assert(nHit === hits, s"query $q: n_hit != |s1 ∩ s2|")
      assert(ppm === 1000000L * hits / nExact)
    }
  }

  test("q59 cohort retention: day-0 row is full and offsets never exceed size") {
    val rows = TemporalQueries.q59CohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val d0 = rs.find(_._2 == 0L)
      assert(d0.isDefined, s"cohort $c missing its day-0 row")
      assert(d0.get._4 === d0.get._3, s"cohort $c day-0 must be fully active")
      assert(d0.get._5 === 1000000L)
      rs.foreach { case (_, off, size, active, ppm) =>
        assert(off >= 0L && active <= size && ppm <= 1000000L)
      }
    }
    assert(rows.exists(r => r._2 > 0L && r._4 < r._3),
      "retention never decays — degenerate fixture")
  }

  test("s13 int8 recall bounds hold and beat the LSH index on this corpus") {
    val s13 = SimilarityQueries.s13QuantRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val s12 = SimilarityQueries.s12IndexRecall(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(s13.nonEmpty)
    s13.foreach { case (q, nExact, nHit, ppm) =>
      assert(nExact === 10L)
      assert(nHit >= 0L && nHit <= nExact)
      assert(ppm === 1000000L * nHit / nExact)
      // int8 keeps full precision up to rounding; losing to the
      // bucketed index would mean the quantized cosine is broken
      assert(ppm >= s12(q), s"query $q: int8 recall below LSH recall")
    }
  }

  test("q57 left-outer interval join covers every click; matched rows = q40 pairs") {
    val q40 = StreamingQueries.q40ClickAfterView(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val q57 = StreamingQueries.q57ClickNoView(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(5)))
    val matched = q57.filter(_._4).map(t => (t._1, t._2, t._3.get)).toSet
    assert(matched === q40, "matched q57 rows must equal the q40 inner join")
    val nClicks = graft.core.Tables.events(spark, sf)
      .where(org.apache.spark.sql.functions.col("event_type") === "click").count()
    val clickKeys = q57.map(t => (t._1, t._2)).distinct.length.toLong
    assert(clickKeys === nClicks, "every click must appear (matched or not)")
    assert(q57.exists(!_._4), "fixture has no unmatched clicks — NULL path untested")
    q57.filter(!_._4).foreach(t => assert(t._3.isEmpty))
  }

  test("g23 eccentricity matches a local BFS reference") {
    val te = GraphQueries.partPairsMaterialized(spark, sf)
      .where(org.apache.spark.sql.functions.col("weight") >= 2.0)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    te.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val verts = (te.map(_._1) ++ te.map(_._2)).distinct.sorted
    val expected = verts.take(5).map { s0 =>
      var d = Map(s0 -> 0L); var frontier = Set(s0)
      for (h <- 1 to 12) {
        frontier = frontier.flatMap(adj).filterNot(d.contains)
        d ++= frontier.map(_ -> h.toLong)
      }
      val reached = d.filter(_._2 > 0)
      val ecc = reached.values.max
      (s0, ecc, reached.size.toLong,
        reached.filter(_._2 == ecc).keys.min)
    }.toSeq
    val got = GraphQueries.g23Eccentricity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.exists(_._2 > 1), "every source's eccentricity is 1 — trivial fixture")
  }

  test("q58 interval merge matches a local sweep reference") {
    val ev = graft.core.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS st",
        "unix_micros(ts) + CAST(round(value * 100) AS BIGINT) * 600000 AS en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(t => (t._3, t._2))
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var curStart = -1L; var curEnd = -1L; var n = 0L
      sorted.foreach { case (_, _, st, en) =>
        if (curStart < 0 || st > curEnd) {
          if (curStart >= 0) spans += ((curStart, curEnd, n))
          curStart = st; curEnd = en; n = 1
        } else { curEnd = math.max(curEnd, en); n += 1 }
      }
      if (curStart >= 0) spans += ((curStart, curEnd, n))
      spans.map { case (s0, e0, k) => (u, s0, e0, e0 - s0, k) }
    }.sortBy(t => (t._1, t._2))
    val got = TemporalQueries.q58IntervalMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.exists(_._5 > 1), "no interval ever merged — degenerate durations")
  }

  test("d22 tfidf cosine matches a local sparse-vector reference") {
    val P = graft.functions.Portable.P
    def wh(w: String): Long = w.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
    val docsRows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val tf = docsRows.map { case (id, t) =>
      id -> t.split(" ", -1).map(wh).groupBy(identity)
        .map { case (h, xs) => h -> math.min(xs.length.toLong, 16L) }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (h, xs) => h -> xs.size.toLong }
    val n = docsRows.length.toLong
    val w = tf.map { case (id, m) =>
      id -> m.map { case (h, t) => h -> t * ((100L * n) / df(h)) } }
    val n2 = w.map { case (id, m) => id -> m.values.map(x => x * x).sum }
    val rareTerms = df.filter { case (_, c) => c >= 2 && c <= 64 }.keySet
    val cand = (for {
      (a, ma) <- tf.toSeq; (b, mb) <- tf.toSeq if a < b
      if (ma.keySet & mb.keySet & rareTerms).nonEmpty
    } yield (a, b))
    val expected = cand.flatMap { case (a, b) =>
      val shared = w(a).keySet & w(b).keySet
      if (shared.isEmpty) None else {
        val dot = shared.toSeq.map(h => w(a)(h) * w(b)(h)).sum
        val cos = BigDecimal(dot.toDouble /
            (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (cos >= 0.5) Some((a, b, shared.size.toLong, cos)) else None
      }
    }.sortBy(t => (t._1, t._2))
    val got = DedupQueries.d22TfidfCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "no tfidf near-dup pairs at spec SF — assertion vacuous")
  }

  test("t16 readability matches a local regex reference") {
    val docsRows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def cnt(t: String, re: String): Long =
      math.max(re.r.findAllIn(t).length.toLong, 1L)
    val expected = docsRows.map { case (id, t) =>
      val nw = cnt(t, "[A-Za-z]+"); val ns = cnt(t, "[.!?]")
      val sy = cnt(t.toLowerCase, "[aeiouy]+")
      (id, nw, ns, sy,
        206835L - (1015L * nw) / ns - (84600L * sy) / nw,
        (390L * nw) / ns + (11800L * sy) / nw - 15590L)
    }.sortBy(_._1).toSeq
    val got = TextQueries.t16Readability(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }
}
