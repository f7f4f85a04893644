package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels behind the native expressions in
  * [[NativeExpressions]]. Each is the one-pass equivalent of a
  * higher-order-function formulation whose DuckDB twin is documented in
  * [[Portable]] — semantics are bit-identical (same codepoint values, same
  * fold order, same modular arithmetic), only the execution is a tight
  * JVM loop instead of an interpreted expression tree (Spark's lambda
  * HOFs are CodegenFallback; measured 10-100x on the sf0.1 dedup bench).
  *
  * All methods are static forwarders (top-level Scala object) so
  * whole-stage codegen can call them directly from generated Java.
  */
object HashUtil {

  /** Modulus for all rolling hashes (31*P fits a long with headroom). */
  val P: Long = 1000000007L

  // MinHash permutation family constants (primes < P).
  val PermA: Long = 961748927L
  val PermB: Long = 885320963L

  /** SimHash fingerprint width. One portable word hash lives in [0, P)
    * — only 30 honest bits — so the 60-bit fingerprint composes TWO
    * independent folds per word: the plain hash (low 30 bits) and a
    * [[SimSalt]]-prefixed hash (high 30 bits). Widening from 30 bits
    * (r10) kills the quadratic chance-collision floor a ≥10⁶-doc corpus
    * hits: P(hamming ≤ 4) drops from C(30,≤2)/2³⁰ ≈ 4.3e-7 (≈39k chance
    * pairs measured on 500k content-independent docs, SURVEY §6.2.1) to
    * C(60,≤4)/2⁶⁰ ≈ 4.5e-13 (≈0.06 pairs at the same N). */
  val SimHashBits: Int = 60

  /** Prefix salt of the second per-word fold: the high half of the
    * fingerprint uses hash(SimSalt ∥ word) — a genuinely different
    * polynomial (the prefix shifts every codepoint's power of 31 by
    * |salt| and adds the salt's own fold), not a bijection of the plain
    * hash, because it depends on word length too. The DuckDB oracle
    * composes the identical concatenation. */
  val SimSalt: String = "fp2:"

  /** Fold of [[SimSalt]] alone — the seed the salted per-word fold
    * starts from (prefix-fold associativity: fold(salt ∥ w, 0) =
    * fold(w, fold(salt, 0))). */
  private val SimSaltSeed: Long =
    charPolyHash(UTF8String.fromString(SimSalt))

  /** Polynomial rolling hash over the Unicode codepoints of a string:
    * `acc = (acc*31 + codepoint) % P`, acc0 = 0. Matches the DuckDB fold
    * `list_reduce(list_prepend(0, list_transform(string_split(s,''),
    * c -> ascii(c))), (a,b) -> (a*31+b) % P)` — DuckDB's ascii() is the
    * codepoint; for the ASCII testdata codepoint == byte. */
  def charPolyHash(s: UTF8String): Long = {
    val b = s.getBytes
    hashRange(b, 0, b.length)
  }

  /** Codepoint-fold hash of the UTF-8 byte range [from, until), folding
    * onto `acc0` (0 for the plain hash; [[SimSaltSeed]] for the salted
    * second fold — equivalent to hashing the salt-prefixed string). */
  private def hashRange(b: Array[Byte], from: Int, until: Int,
                        acc0: Long = 0L): Long = {
    var acc = acc0
    var i = from
    while (i < until) {
      val c = b(i) & 0xFF
      var cp = 0
      var len = 1
      if (c < 0x80) cp = c
      else if ((c & 0xE0) == 0xC0) { cp = c & 0x1F; len = 2 }
      else if ((c & 0xF0) == 0xE0) { cp = c & 0x0F; len = 3 }
      else { cp = c & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < until) { cp = (cp << 6) | (b(i + j) & 0x3F); j += 1 }
      acc = (acc * 31L + cp) % P
      i += len
    }
    acc
  }

  /** Word boundaries of a single-space split, Java `split(" ", -1)`
    * semantics (leading/inner/trailing empty tokens all kept — what
    * Spark's `split(text, " ")` and DuckDB's `string_split(text, ' ')`
    * both produce). Returns flat pairs [start0, end0, start1, end1, ...];
    * the space byte 0x20 can never be a UTF-8 continuation byte, so byte
    * scanning is codepoint-safe. */
  private def wordBounds(b: Array[Byte]): Array[Int] = {
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    val out = new Array[Int](2 * n)
    var w = 0
    var start = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') { out(2 * w) = start; out(2 * w + 1) = i; w += 1; start = i + 1 }
      i += 1
    }
    out(2 * w) = start
    out(2 * w + 1) = b.length
    out
  }

  /** Distinct k-word-shingle hashes in first-occurrence order — exactly
    * `array_distinct(transform(shingles(split(text," "), k), charHash))`.
    * Because words are split on single spaces and shingles re-join with a
    * single space, each shingle string is a verbatim substring of the
    * original text, so the hash folds directly over the text bytes with
    * no intermediate strings. Fewer than k words → empty array (the
    * `sequence(1,0)` guard of [[Portable.shingles]]). */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    val bounds = wordBounds(b)
    val nWords = bounds.length / 2
    if (nWords < k) return new GenericArrayData(Array.emptyLongArray)
    val nSh = nWords - k + 1
    val seen = new java.util.HashSet[java.lang.Long](nSh * 2)
    val out = new Array[Long](nSh)
    var m = 0
    var i = 0
    while (i < nSh) {
      val h = hashRange(b, bounds(2 * i), bounds(2 * (i + k - 1) + 1))
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == nSh) out else java.util.Arrays.copyOf(out, m))
  }

  /** Per-position k-word span hashes (NOT distinct, position order —
    * the duplicate-span detection primitive; [[shingleHashes]] minus the
    * dedup). Same verbatim-substring property: each span hash folds
    * directly over the original text bytes. */
  def spanHashes(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    val bounds = wordBounds(b)
    val nWords = bounds.length / 2
    if (nWords < k) return new GenericArrayData(Array.emptyLongArray)
    val nSh = nWords - k + 1
    val out = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      out(i) = hashRange(b, bounds(2 * i), bounds(2 * (i + k - 1) + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-word polynomial hashes (not distinct, document order). */
  def wordHashes(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val bounds = wordBounds(b)
    val nWords = bounds.length / 2
    val out = new Array[Long](nWords)
    var i = 0
    while (i < nWords) {
      out(i) = hashRange(b, bounds(2 * i), bounds(2 * i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Repetition statistics of a document in ONE pass:
    * [n_words, top_word_count, n_distinct_words, top_bigram_count,
    * n_bigrams]. Counts key on the exact word/bigram BYTES (not their
    * hashes — a hash collision would silently merge two distinct words'
    * counts and diverge from the relational oracle). Per-doc state only:
    * the 100 TB shape, since every metric here is row-local — the
    * explode + (doc, term) aggregate formulation shuffles O(corpus
    * tokens) for what a row can answer alone. */
  def repStats(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val bounds = wordBounds(b)
    val nWords = bounds.length / 2
    val wc = new java.util.HashMap[String, Array[Long]](nWords * 2)
    var i = 0
    while (i < nWords) {
      val w = new String(b, bounds(2 * i), bounds(2 * i + 1) - bounds(2 * i),
        java.nio.charset.StandardCharsets.UTF_8)
      val cur = wc.get(w)
      if (cur == null) wc.put(w, Array(1L)) else cur(0) += 1
      i += 1
    }
    var topW = 0L
    val itW = wc.values().iterator()
    while (itW.hasNext) { val c = itW.next()(0); if (c > topW) topW = c }
    val nBigrams = math.max(nWords - 1, 0)
    var topB = 0L
    if (nBigrams > 0) {
      // a bigram joined by the single split space is a verbatim substring
      val bc = new java.util.HashMap[String, Array[Long]](nBigrams * 2)
      i = 0
      while (i < nBigrams) {
        val g = new String(b, bounds(2 * i), bounds(2 * (i + 1) + 1) - bounds(2 * i),
          java.nio.charset.StandardCharsets.UTF_8)
        val cur = bc.get(g)
        if (cur == null) bc.put(g, Array(1L)) else cur(0) += 1
        i += 1
      }
      val itB = bc.values().iterator()
      while (itB.hasNext) { val c = itB.next()(0); if (c > topB) topB = c }
    }
    new GenericArrayData(
      Array(nWords.toLong, topW, wc.size().toLong, topB, nBigrams.toLong))
  }

  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]

  /** Permutation family h_p(x) = (a_p*x + b_p) mod P with
    * a_p = ((p+1)*PermA + 7) % P, b_p = ((p+1)*PermB + 3) % P — the same
    * constants the DuckDB oracle's `perms` CTE generates. */
  private def perms(numPerms: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(numPerms, _ => {
      val a = new Array[Long](numPerms)
      val b = new Array[Long](numPerms)
      var p = 0
      while (p < numPerms) {
        a(p) = ((p + 1) * PermA + 7) % P
        b(p) = ((p + 1) * PermB + 3) % P
        p += 1
      }
      (a, b)
    })

  /** MinHash band signatures of a shingle-hash set, one BIGINT per band:
    * minv_p = min over the set of (a_p*h + b_p) % P, then each band's r
    * consecutive minima (perm order) fold as (acc*31 + minv) % P — the
    * `mins`/`bands` CTEs of the oracle collapsed into one per-row kernel
    * (the round-1 formulation exploded |set|×numPerms rows through a
    * shuffle to compute the same thing). */
  def minHashBandSigs(sh: ArrayData, numPerms: Int, bands: Int): ArrayData = {
    val hs = sh.toLongArray()
    val (pa, pb) = perms(numPerms)
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var p = 0
      while (p < numPerms) {
        val v = (pa(p) * h + pb(p)) % P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    val r = numPerms / bands
    val sigs = new Array[Long](bands)
    var bnd = 0
    while (bnd < bands) {
      var acc = 0L
      var q = bnd * r
      val end = q + r
      while (q < end) { acc = (acc * 31L + mins(q)) % P; q += 1 }
      sigs(bnd) = acc
      bnd += 1
    }
    new GenericArrayData(sigs)
  }

  /** Per-permutation MinHash minima (the `mins` stage of
    * [[minHashBandSigs]] without the band fold) — the estimator's raw
    * material: P(min_a = min_b) = jaccard(a, b), so positionwise
    * agreement over the minima vector IS the MinHash estimate. */
  def minHashMins(sh: ArrayData, numPerms: Int): ArrayData = {
    val hs = sh.toLongArray()
    val (pa, pb) = perms(numPerms)
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var p = 0
      while (p < numPerms) {
        val v = (pa(p) * h + pb(p)) % P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** SimHash fingerprint of a document: per distinct 60-bit word key k
    * (low 30 bits = plain word hash, high 30 = [[SimSalt]]-prefixed
    * hash) with term frequency tf, add +tf to bit-weight j when bit j
    * of k is set, -tf when clear; fingerprint sets bit j iff the total
    * weight is positive. Grouping by the composed key instead of by
    * word string is exact: the sign at every bit depends only on k, so
    * double-colliding words' contributions add. */
  def simHashFp(s: UTF8String): Long = {
    val b = s.getBytes
    val bounds = wordBounds(b)
    val nWords = bounds.length / 2
    val tf = new java.util.HashMap[java.lang.Long, Array[Long]](nWords * 2)
    var i = 0
    while (i < nWords) {
      val h1 = hashRange(b, bounds(2 * i), bounds(2 * i + 1))
      val h2 = hashRange(b, bounds(2 * i), bounds(2 * i + 1), SimSaltSeed)
      val h = h1 | (h2 << 30)
      val cur = tf.get(h)
      if (cur == null) tf.put(h, Array(1L)) else cur(0) += 1
      i += 1
    }
    val w = new Array[Long](SimHashBits)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = e.getKey.longValue()
      val c = e.getValue()(0)
      var j = 0
      while (j < SimHashBits) {
        if (((h >>> j) & 1L) == 1L) w(j) += c else w(j) -= c
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < SimHashBits) {
      if (w(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Intersection size of two sorted, duplicate-free BIGINT arrays
    * (merge scan — no per-call hash set, unlike `array_intersect`). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    var i = 0
    var j = 0
    var c = 0L
    while (i < x.length && j < y.length) {
      if (x(i) < y(j)) i += 1
      else if (x(i) > y(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Dot product of two DOUBLE arrays, summed strictly left-to-right —
    * the identical addition order (hence identical floating-point result)
    * as `aggregate(zip_with(a, b, *), 0.0, +)` and DuckDB's
    * `list_reduce(list_prepend(0.0, list_transform(list_zip(a,b),
    * s -> s[1]*s[2])), +)`. */
  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * coordinates: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Inputs are masked to `bits` first, so out-of-domain coordinates
    * degrade locality but never throw (ANSI-safe total function).
    * Monotone in each coordinate, so for any query box
    * [x0,x1]×[y0,y1] every point inside has
    * z(x0,y0) <= z <= z(x1,y1) — the superset prefilter a z-ordered
    * layout pushes down to file/row-group statistics. */
  def interleaveBits(x: Long, y: Long, bits: Int): Long = {
    val b = if (bits < 1) 1 else if (bits > 31) 31 else bits
    val mask = (1L << b) - 1L
    val mx = x & mask
    val my = y & mask
    var z = 0L
    var i = 0
    while (i < b) {
      z |= ((mx >> i) & 1L) << (2 * i)
      z |= ((my >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
