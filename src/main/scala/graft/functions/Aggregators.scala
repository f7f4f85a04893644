package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (`Aggregator[IN, BUF, OUT]`) — the engine's
  * UDAF surface, the Spark-native analog of the reference's `reduce`
  * extension hook (`/root/reference/gmr.h:84`, overridden per algorithm
  * at `algorithms.h:24,73,138`). Registered per-query via
  * `functions.udaf`; Catalyst plans them with map-side partial
  * aggregation (merge) exactly like built-ins — the partial/final split
  * the reference never had (SURVEY.md §2.2 "no combiners").
  *
  * Buffers are integer-only on purpose: a Double-summing aggregator's
  * result depends on accumulation order, which a distributed engine does
  * not fix — integer buffers make the result reproducible and
  * oracle-checkable (see [[Portable]] on engine-portable determinism).
  */
object Aggregators {

  /** Quantity-weighted mean of an integer-cents measure:
    * Σ(w·cents) / Σw, finished in double. */
  object WeightedMeanCents extends Aggregator[(Long, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
      (b._1 + in._1 * in._2, b._2 + in._1)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0L) Double.NaN else r._1.toDouble / r._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV ("bottom-k") distinct-count sketch buffer: the k smallest
    * distinct hash values seen, ascending. */
  final case class KmvBuf(hs: Seq[Long])

  /** Single-pass mergeable distinct-count estimator over pre-hashed
    * values (hash onto [0, P); see
    * [[graft.operators.SketchQueries]] for the estimator math and the
    * oracle-checked declarative twin). State is O(k) per group and
    * merge-associative, so Catalyst's partial aggregation gives a
    * full map-side combine — the exact `count(DISTINCT)` instead
    * shuffles every distinct value. Estimate: (k-1) * P / h_(k),
    * truncating division (matches `DIV`/`//` in the declarative twin).
    */
  final class KmvDistinct(k: Int, p: Long)
      extends Aggregator[Long, KmvBuf, Long] {
    override def zero: KmvBuf = KmvBuf(Vector.empty)
    override def reduce(b: KmvBuf, h: Long): KmvBuf =
      if (b.hs.length == k && h >= b.hs.last) b
      else if (b.hs.contains(h)) b
      else KmvBuf(((b.hs :+ h).sorted).take(k))
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
      KmvBuf((a.hs ++ b.hs).distinct.sorted.take(k))
    override def finish(b: KmvBuf): Long =
      if (b.hs.length < k) b.hs.length.toLong
      else (k - 1).toLong * p / b.hs.last
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Count-Min sketch buffer: d×w counter matrix, flattened row-major. */
  final case class CmsBuf(counts: Seq[Long])

  /** Single-pass mergeable Count-Min frequency sketch: row r hashes the
    * key into one of w counters and increments it; the frequency estimate
    * for a key is the MIN of its d counters — an upper bound on the true
    * count (counters only ever over-count, by whatever shares the
    * bucket), within εN with probability 1-δ for w = e/ε, d = ln(1/δ).
    * State is fixed d·w longs and merge is elementwise sum, so Catalyst
    * runs it with full map-side partial aggregation: the heavy-hitter
    * question that exactly needs a per-key shuffle (`groupBy(key).count`)
    * becomes O(d·w) bytes per map task regardless of key cardinality.
    * Estimator math and the oracle-checked declarative twin live in
    * [[graft.operators.SketchQueries]] (q35); [[SketchAndScaleSpec]]
    * verifies the two paths equal and the never-undercounts bound.
    *
    * Keys are reduced mod P before the row hash (floorMod — total on the
    * full BIGINT domain, a no-op for the non-negative gated keys). */
  final class CmsSketch(d: Int, w: Int, rowA: Seq[Long], rowB: Seq[Long])
      extends Aggregator[Long, CmsBuf, Seq[Long]] {
    require(rowA.length == d && rowB.length == d)
    override def zero: CmsBuf = CmsBuf(Vector.fill(d * w)(0L))
    private[graft] def bucket(k: Long, r: Int): Int = {
      val km = Math.floorMod(k, graft.functions.Portable.P)
      (Math.floorMod(km * rowA(r) + rowB(r), graft.functions.Portable.P) % w).toInt
    }
    override def reduce(b: CmsBuf, k: Long): CmsBuf = {
      var c = b.counts
      var r = 0
      while (r < d) { val i = r * w + bucket(k, r); c = c.updated(i, c(i) + 1L); r += 1 }
      CmsBuf(c)
    }
    override def merge(a: CmsBuf, b: CmsBuf): CmsBuf =
      CmsBuf(a.counts.lazyZip(b.counts).map(_ + _))
    override def finish(b: CmsBuf): Seq[Long] = b.counts
    /** Point estimate from a finished sketch. */
    def estimate(counts: Seq[Long], k: Long): Long =
      (0 until d).map(r => counts(r * w + bucket(k, r))).min
    override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Elementwise sum buffer for fixed-width long vectors + row count. */
  final case class VecSumBuf(sums: Seq[Long], n: Long)

  /** Elementwise truncating integer mean of quantized vectors — the
    * Lloyd centroid-update aggregate. The posexplode formulation pushes
    * d rows per INPUT vector through two aggregate stages (N·d rows per
    * round, the hot-loop row volume of the cell build at scale); this
    * buffer accumulates one O(d) array per group per map task instead —
    * map-side combinable, merge-associative, and the finish computes
    * the same exact `sum DIV count` integer means in JVM longs, so the
    * result is bit-identical to the per-dim formulation (pinned by
    * KmeansArrayParitySpec and the in-JVM replay). Empty groups cannot
    * reach finish through groupBy, but a merge-of-zeros can: n == 0
    * finishes null so the caller's coalesce keeps the previous
    * centroid. */
  final class VecMean extends Aggregator[Seq[Long], VecSumBuf, Seq[Long]] {
    override def zero: VecSumBuf = VecSumBuf(Vector.empty, 0L)
    override def reduce(b: VecSumBuf, v: Seq[Long]): VecSumBuf =
      if (b.n == 0L) VecSumBuf(v.toVector, 1L)
      else VecSumBuf(b.sums.lazyZip(v).map(_ + _), b.n + 1L)
    override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else VecSumBuf(a.sums.lazyZip(b.sums).map(_ + _), a.n + b.n)
    override def finish(b: VecSumBuf): Seq[Long] =
      if (b.n == 0L) null else b.sums.map(_ / b.n)
    override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** One (measure, id) candidate held by [[BottomK]]. */
  final case class ScoredId(m: Long, id: Long)

  /** Bottom-k buffer: the k smallest (measure, id) pairs seen, ascending
    * lexicographic. */
  final case class TopKBuf(pairs: Seq[ScoredId])

  /** Bounded top-k selection as a mergeable aggregate: keeps the k
    * lexicographically-smallest (measure, id) pairs per group. The
    * Window-function form (`row_number() OVER (ORDER BY measure)` then
    * `rank <= k`) SORTS every row of every group before discarding all
    * but k — a full per-group sort at scale. This buffer is O(k) per
    * group, reduce is an insert-if-smaller, and merge is associative, so
    * Catalyst runs it with map-side partial aggregation: each map task
    * ships at most k pairs per group no matter how many candidates it
    * scanned. Ties are impossible when `id` is unique within the group
    * (the ANN use), and broken by id otherwise — the same total order as
    * `ORDER BY m, id`, so results match the windowed form row-for-row. */
  final class BottomK(k: Int) extends Aggregator[(Long, Long), TopKBuf, Seq[ScoredId]] {
    private val ord: Ordering[ScoredId] = Ordering.by(s => (s.m, s.id))
    override def zero: TopKBuf = TopKBuf(Vector.empty)
    override def reduce(b: TopKBuf, in: (Long, Long)): TopKBuf = {
      val s = ScoredId(in._1, in._2)
      if (b.pairs.length == k && ord.gteq(s, b.pairs.last)) b
      else TopKBuf((b.pairs :+ s).sorted(ord).take(k))
    }
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf((a.pairs ++ b.pairs).sorted(ord).take(k))
    override def finish(b: TopKBuf): Seq[ScoredId] = b.pairs
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }

  /** HyperLogLog register buffer: `regs(b)` = max rho seen in bucket b
    * (0 = bucket never hit). */
  final case class HllBuf(regs: Seq[Int])

  /** Single-pass mergeable HyperLogLog distinct-count estimator over
    * pre-hashed values (hash onto [0, P) — ~30 honest bits). Unlike
    * [[KmvDistinct]] the state is FIXED size (m registers; merge =
    * elementwise max) and needs no pre-distinct: duplicate values land in
    * the same bucket with the same rho and are absorbed by the max.
    * Estimator math and the oracle-checked declarative twin live in
    * [[graft.operators.SketchQueries]]; [[HllSketchSpec]] verifies the
    * two paths bit-equal. The finish sum is order-independent even in
    * double: each term is 2^-rho with rho ≤ 23, so every partial sum is
    * an exact multiple of 2^-23 below 2^9 — no rounding ever occurs.
    *
    * Input domain: calibrated for hashes in [0, P) (rho assumes ≤ maxRho-1
    * value bits after the bucket split). Out-of-domain inputs — e.g.
    * `hllHashSql` fed ids beyond ±~3·10⁹, where k² overflows BIGINT and
    * the hash goes negative — must not crash the pipeline, so the sign
    * bit is cleared before bucketing and rho is floored at 1: such rows
    * degrade the estimate (they carry junk leading-zero statistics), never
    * the job. */
  final class HllDistinct(m: Int, maxRho: Int) extends Aggregator[Long, HllBuf, Double] {
    override def zero: HllBuf = HllBuf(Vector.fill(m)(0))
    private def rho(v: Long): Int =
      if (v == 0L) maxRho
      else math.max(1, maxRho - java.lang.Long.toBinaryString(v).length)
    override def reduce(b: HllBuf, h: Long): HllBuf = {
      val u = h & Long.MaxValue // no-op in [0, P); rescues negative hashes
      val bucket = (u % m).toInt
      val r = rho(u / m)
      if (r <= b.regs(bucket)) b else HllBuf(b.regs.updated(bucket, r))
    }
    override def merge(a: HllBuf, b: HllBuf): HllBuf =
      HllBuf(a.regs.lazyZip(b.regs).map(math.max))
    /** Loglog estimate with the standard linear-counting small-range
      * correction: below 2.5·m the raw estimator's collision-blind bias
      * dominates, but with V empty registers the occupancy itself is a
      * (much better) estimator — m·ln(m/V), the coupon-collector MLE.
      * The ln here is JVM Math.log: the declarative twin embeds the SAME
      * JVM-computed values as literals (and the DuckDB oracle as %.17g
      * round-trip-exact literals), so all three paths stay bit-equal
      * without trusting cross-libm ln (the no-libm gate rule). */
    override def finish(b: HllBuf): Double = {
      val invSum = b.regs.map(r => 1.0 / (1L << r).toDouble).sum
      val raw = 0.7213 / (1.0 + 1.079 / m) * m * m / invSum
      val v = b.regs.count(_ == 0)
      if (raw <= 2.5 * m && v > 0) m * math.log(m.toDouble / v) else raw
    }
    override def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
