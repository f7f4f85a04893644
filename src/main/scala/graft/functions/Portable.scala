package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives.
  *
  * Every hash/tokenize/shingle operation here is defined purely in terms of
  * operations that exist with identical semantics in Spark SQL and ANSI-ish
  * SQL engines (the DuckDB oracle), so each operator built on them can be
  * verified by the driver's hash-match gate. That rules out engine-native
  * hashes (Spark murmur3 vs DuckDB's hash()) — instead: explicit polynomial
  * rolling hashes in BIGINT arithmetic, left-folded in deterministic order.
  *
  * All codegen-friendly: built-in higher-order functions, no UDFs
  * (SURVEY.md "Functions, not UDFs").
  */
object Portable {

  /** Modulus for all rolling hashes (fits 31*p in a long with headroom). */
  val P: Long = 1000000007L

  /** Characters of a string, excluding the trailing empty token Java's
    * split("") emits (DuckDB's string_split(s,'') has no such token). */
  def chars(s: Column): Column = filter(split(s, ""), c => c =!= "")

  /** Left-fold polynomial hash over the characters of a string:
    * `acc = (acc*31 + ascii(char)) % P`. DuckDB equivalent:
    * `list_reduce(list_prepend(0::BIGINT, list_transform(string_split(s,''),
    *  c -> ascii(c)::BIGINT)), (a,b) -> (a*31+b) % P)`. Native codegen'd
    * kernel ([[CharPolyHash]]/[[HashUtil.charPolyHash]]); the equivalent
    * HOF fold (`aggregate(chars(s), ...)`) is CodegenFallback and ~50x
    * slower per row. */
  def charHash(s: Column): Column = call_function("graft_char_hash", s)

  /** Left-fold polynomial hash over a BIGINT array. */
  def longFold(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => (acc * lit(31L) + x) % lit(P))

  /** Whitespace word tokens. */
  def words(s: Column): Column = split(s, " ")

  /** k-word shingles joined by single spaces; empty array when the doc has
    * fewer than k words (guard needed: Spark's sequence(1,0) would count
    * DOWN). DuckDB equivalent: list_transform(range(1, len-k+2), i -> ...). */
  def shingles(wordsCol: Column, k: Int): Column = {
    val n = size(wordsCol) - (k - 1)
    when(n >= 1,
      transform(sequence(lit(1), n), i =>
        concat_ws(" ", (0 until k).map(o => element_at(wordsCol, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle hashes of a document — the set representation used
    * by jaccard / MinHash dedup. Semantics:
    * `array_distinct(transform(shingles(words(text), k), charHash))`,
    * executed by the one-pass native kernel [[HashUtil.shingleHashes]]
    * (each shingle is a verbatim substring of the text, so the hash folds
    * straight over the text bytes — no intermediate shingle strings, no
    * interpreted HOF tree). Callers should still fan out single-file
    * scans before heavy per-row projections. */
  def shingleHashes(text: Column, k: Int): Column =
    call_function("graft_shingle_hashes", text, lit(k))

  /** Per-position k-word span hashes (position order, NOT distinct) —
    * native kernel; the duplicate-span primitive. */
  def spanHashes(text: Column, k: Int): Column =
    call_function("graft_span_hashes", text, lit(k))

  /** Per-word hashes (document order, not distinct) — native kernel. */
  def wordHashes(text: Column): Column = call_function("graft_word_hashes", text)

  /** Left-to-right dot product of two DOUBLE arrays — native kernel with
    * the same float addition order as `aggregate(zip_with(a,b,*),0.0,+)`
    * and DuckDB's `list_reduce(list_prepend(0.0, ...), +)`. */
  def vecDot(a: Column, b: Column): Column = call_function("graft_vec_dot", a, b)

  /** Euclidean norm via [[vecDot]] (fold order matches the oracle). */
  def vecNorm(v: Column): Column = sqrt(vecDot(v, v))

  /** Exact jaccard similarity of two BIGINT-array sets (inputs must be
    * distinct); integer counts divided in double — exact in both engines. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Morton (Z-order) key of two BIGINT coordinates, `bits` bits each —
    * native kernel. DuckDB twin (inputs pre-masked to `bits`):
    * `list_sum(list_transform(range(bits), i ->
    *   (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i+1))))`. */
  def zorder(x: Column, y: Column, bits: Int): Column =
    call_function("graft_zorder", x, y, lit(bits))
}
