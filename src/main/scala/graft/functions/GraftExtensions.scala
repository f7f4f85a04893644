package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector for the engine's native expressions
  * (usable as `spark.sql.extensions=graft.functions.GraftExtensions` or
  * programmatically via `builder.withExtensions` — [[graft.core.GraftSession]]
  * does the latter, so Verify/Bench/tests all get the `graft_*` SQL
  * functions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.register(ext)
}

object GraftExtensions {

  /** (name, class, builder) for every native function. */
  private val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_char_hash", classOf[CharPolyHash], es => CharPolyHash(es.head)),
    ("graft_shingle_hashes", classOf[ShingleHashes], es => ShingleHashes(es(0), es(1))),
    ("graft_word_hashes", classOf[WordHashes], es => WordHashes(es.head)),
    ("graft_span_hashes", classOf[SpanHashes], es => SpanHashes(es(0), es(1))),
    ("graft_rep_stats", classOf[RepStats], es => RepStats(es.head)),
    ("graft_minhash_bands", classOf[MinHashBandSigs], es => MinHashBandSigs(es(0), es(1), es(2))),
    ("graft_minhash_mins", classOf[MinHashMins], es => MinHashMins(es(0), es(1))),
    ("graft_simhash", classOf[SimHashFp], es => SimHashFp(es.head)),
    ("graft_sorted_intersect_count", classOf[SortedIntersectCount],
      es => SortedIntersectCount(es(0), es(1))),
    ("graft_vec_dot", classOf[VecDot], es => VecDot(es(0), es(1))),
    ("graft_zorder", classOf[ZOrderKey], es => ZOrderKey(es(0), es(1), es(2))))

  def register(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder))
    }
}
