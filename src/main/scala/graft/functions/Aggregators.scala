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
}
