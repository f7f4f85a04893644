package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot per-row kernels
  * (SURVEY.md: "a native Catalyst `Expression` (with doGenCode) beats a
  * Scala UDF beats anything else"). Each participates in whole-stage
  * codegen via `defineCodeGen` emitting a single static call into
  * [[HashUtil]] — unlike the built-in lambda higher-order functions
  * (`transform`/`aggregate`), which are CodegenFallback and evaluate an
  * interpreted expression tree per element.
  *
  * Registered under `graft_*` names by [[GraftExtensions]]
  * (SparkSessionExtensions.injectFunction); use via
  * `functions.call_function` — see [[Portable]] for the Column wrappers
  * and the DuckDB-oracle equivalents of each.
  */
object NativeExpressions // scaladoc anchor

/** `graft_char_hash(str)` → BIGINT: polynomial codepoint hash
  * (acc*31 + cp) % P. */
case class CharPolyHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_hash"
  override protected def nullSafeEval(s: Any): Any =
    HashUtil.charPolyHash(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.charPolyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): CharPolyHash =
    copy(child = newChild)
}

/** `graft_shingle_hashes(text, k)` → ARRAY<BIGINT>: distinct k-word
  * shingle hashes, first-occurrence order. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(t: Any, k: Any): Any =
    HashUtil.shingleHashes(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.functions.HashUtil.shingleHashes($t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleHashes =
    copy(left = l, right = r)
}

/** `graft_span_hashes(text, k)` → ARRAY<BIGINT>: per-position k-word
  * span hashes, NOT distinct ([[ShingleHashes]] minus the dedup) — the
  * duplicate-span detection primitive (d11). */
case class SpanHashes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_hashes"
  override protected def nullSafeEval(t: Any, k: Any): Any =
    HashUtil.spanHashes(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.functions.HashUtil.spanHashes($t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SpanHashes =
    copy(left = l, right = r)
}

/** `graft_rep_stats(text)` → ARRAY<BIGINT>: one-pass repetition stats
  * [n_words, top_word_count, n_distinct_words, top_bigram_count,
  * n_bigrams] (see [[HashUtil.repStats]]). */
case class RepStats(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rep_stats"
  override protected def nullSafeEval(s: Any): Any =
    HashUtil.repStats(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.repStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** `graft_word_hashes(text)` → ARRAY<BIGINT>: per-word hash, document
  * order (not distinct). */
case class WordHashes(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_hashes"
  override protected def nullSafeEval(s: Any): Any =
    HashUtil.wordHashes(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.wordHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): WordHashes =
    copy(child = newChild)
}

/** `graft_minhash_bands(sh, numPerms, bands)` → ARRAY<BIGINT>: one folded
  * MinHash band signature per band. */
case class MinHashBandSigs(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"
  override protected def nullSafeEval(sh: Any, np: Any, nb: Any): Any =
    HashUtil.minHashBandSigs(
      sh.asInstanceOf[ArrayData], np.asInstanceOf[Int], nb.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (sh, np, nb) => s"graft.functions.HashUtil.minHashBandSigs($sh, $np, $nb)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MinHashBandSigs =
    copy(first = f, second = s, third = t)
}

/** `graft_minhash_mins(sh, numPerms)` → ARRAY<BIGINT>: the per-permutation
  * MinHash minima (the estimator's raw vector; positionwise agreement
  * between two docs' vectors estimates their jaccard). */
case class MinHashMins(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_mins"
  override protected def nullSafeEval(sh: Any, np: Any): Any =
    HashUtil.minHashMins(sh.asInstanceOf[ArrayData], np.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (sh, np) => s"graft.functions.HashUtil.minHashMins($sh, $np)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MinHashMins = copy(left = l, right = r)
}

/** `graft_zorder(x, y, bits)` → BIGINT: Morton interleave of the low
  * `bits` bits of two BIGINT coordinates (x even positions, y odd) —
  * the multi-dimensional clustering key for z-ordered data layout
  * ([[graft.io.Layout]]). Monotone per coordinate, so a query box maps
  * to one z range usable as a file/row-group prefilter. */
case class ZOrderKey(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"
  // Interpreted eval (constant folding) may see INT or BIGINT children —
  // accept either, exactly as the codegen path does via Java widening.
  override protected def nullSafeEval(x: Any, y: Any, b: Any): Any =
    HashUtil.interleaveBits(
      x.asInstanceOf[Number].longValue(),
      y.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y, b) => s"graft.functions.HashUtil.interleaveBits($x, $y, $b)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZOrderKey =
    copy(first = f, second = s, third = t)
}

/** `graft_simhash(text)` → BIGINT: 60-bit composed SimHash fingerprint. */
case class SimHashFp(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(s: Any): Any =
    HashUtil.simHashFp(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.simHashFp($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

/** `graft_sorted_intersect_count(a, b)` → BIGINT: merge-scan intersection
  * size of two sorted duplicate-free BIGINT arrays. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashUtil.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** `graft_vec_dot(a, b)` → DOUBLE: left-to-right dot product (same
  * float addition order as the HOF/list_reduce folds it replaces). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.vecDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashUtil.vecDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}
