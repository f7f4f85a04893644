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
}
