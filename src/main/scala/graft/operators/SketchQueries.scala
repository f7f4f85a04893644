package graft.operators

import graft.graph.Materialize.MaterializeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable

/** Sketch-based approximate operators — the 100 TB answer to questions
  * whose exact form needs a full shuffle of every distinct value.
  *
  * q29: KMV (k-minimum-values, "bottom-k") distinct-count sketch. The
  * exact `count(DISTINCT x)` at scale shuffles every distinct value to
  * its group's reducer; the KMV estimate ships only the k smallest hash
  * values per group — a fixed-size, mergeable state, so partial
  * aggregation handles arbitrarily many distincts with O(k) bytes per
  * group per map task. Estimator: with k-th smallest hash `h(k)` of a
  * uniform hash onto [0, P), distinct ≈ (k-1) * P / h(k).
  *
  * Two implementations, verified equal ([[KmvSketchSpec]]):
  *  - the oracle-checkable declarative form below (distinct → per-group
  *    bottom-k window → closed-form estimate), exact-portable because the
  *    hash is an explicit multiplicative fold (the reference's own
  *    `simple_hash` constant 2654435761, `/root/reference/partition.h:831-858`)
  *    and the estimate is integer arithmetic;
  *  - the production single-pass path: the typed mergeable
  *    [[graft.functions.Aggregators.KmvDistinct]] `Aggregator` whose
  *    buffer is the sorted bottom-k array (map-side partial merge, no
  *    distinct shuffle at all).
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Sketch size: estimates within ~1/sqrt(K) ≈ 12% relative error. */
  val K = 64

  /** q29: per-returnflag distinct-order estimate vs the exact count. */
  def q29KmvDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val h = ($"l_orderkey" * lit(2654435761L)) % lit(Portable.P)
    // KMV state dedups by hash value: distinct (group, h) then bottom-k.
    val hs = li.select($"l_returnflag", h.as("h")).distinct()
    val w = Window.partitionBy($"l_returnflag").orderBy($"h")
    val sk = hs.withColumn("rn", row_number().over(w)).where($"rn" <= K)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_kept"), max($"h").as("kth"))
    // `DIV` / `//` (truncating integer division; floor == truncate here,
    // everything positive) — a double divide + CAST would round in DuckDB
    // but truncate in Spark.
    val est = when($"n_kept" < K, $"n_kept")
      .otherwise(expr(s"${(K - 1).toLong * Portable.P} DIV kth"))
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n_exact"))
    sk.join(exact, "l_returnflag")
      .select($"l_returnflag",
        $"n_exact",
        est.cast("long").as("kmv_estimate"),
        round(est.cast("double") / $"n_exact", 4).as("ratio"))
      .orderBy($"l_returnflag")
  }

  /** HLL register count (m) and the rho ceiling: hashes live in [0, P)
    * ≈ 30 bits, so after the 8 bucket bits the remaining value v fits 22
    * bits — rho(v) = leading-zeros-within-22-bits + 1 ∈ [1, 23]. */
  val HllM = 256
  val HllMaxRho = 23

  /** alpha_m · m² for m = 256 — spelled as the same literal arithmetic in
    * the oracle SQL; every step (÷256 is a power of two, one add, one
    * divide, exact ×65536) is a single IEEE op, so both engines fold it
    * to the identical double. */
  private val HllAlphaM2 = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
  private[operators] val HllAlphaM2Sql = "0.7213/(1 + 1.079/256)*65536"

  /** q34: per-returnflag distinct-part estimate via HyperLogLog — the
    * OTHER classic distinct sketch, complementing q29's KMV with a
    * different scale trade: fixed m-register state (vs KMV's bottom-k
    * values) and NO pre-distinct anywhere — duplicates land in the same
    * bucket with the same rho and the register max absorbs them, so the
    * whole estimate is two map-combinable hash aggregates (value→bucket
    * max, bucket→group sum). The exact `count(DISTINCT)` column beside it
    * shuffles every distinct value; at 100 TB only the sketch survives.
    *
    * Portability: rho comes from the binary-string length of v (`bin()`,
    * identical in Spark and DuckDB — no log2/libm), and the harmonic sum
    * Σ2^-rho is EXACT in double (multiples of 2^-23 summing below 2^9
    * never round), so the estimate is bit-identical cross-engine with a
    * single rounding at the very end. Production single-pass path: the
    * typed mergeable [[graft.functions.Aggregators.HllDistinct]], verified
    * bit-equal in HllSketchSpec. */
  /** HLL needs a hash whose BIT PATTERNS are uniform, not merely its
    * values equidistributed: the q29-style linear hash (k·A mod P) maps
    * sequential keys onto an evenly-spaced lattice whose leading-zero
    * statistics are badly skewed (measured +56% estimate bias). One
    * quadratic term breaks the lattice: h = ((k² mod P)·A + 7919k + 13)
    * mod P — still plain BIGINT arithmetic, bit-exactly replicable in SQL.
    *
    * Total on the FULL BIGINT domain: k is reduced mod P before the
    * square (|k mod P|² < 1.1·10¹⁸ and ×A after the second mod < 2.7·10¹⁸,
    * both inside Long — a raw k² would hit Spark 4's ANSI overflow error
    * for snowflake-scale ids), and the final `(x % P + P) % P` folds the
    * truncating remainder's negative branch into [0, P). Both are exact
    * no-ops for the keys the gated queries feed (0 ≤ k < P), so oracle
    * hashes are unchanged. */
  private[graft] def hllHashSql(k: String): String = {
    val p = Portable.P
    val km = s"($k % $p)"
    s"(((($km * $km) % $p) * 2654435761 + $km * 7919 + 13) % $p + $p) % $p"
  }

  /** Linear-counting table for the small-range correction: entry V
    * (1-based) = m·ln(m/V), V = number of empty registers. Generated
    * ONCE in the JVM and shared by all three paths — the
    * [[graft.functions.Aggregators.HllDistinct]] finish computes the
    * same `Math.log` expression, the Spark declarative side embeds
    * these doubles as literals, and the DuckDB oracle parses them from
    * %.17g round-trip-exact literals — so the correction never trusts
    * ln agreeing across libms (the no-libm gate rule). */
  private[graft] val HllLinearTable: IndexedSeq[Double] =
    (1 to HllM).map(v => HllM * math.log(HllM.toDouble / v))
  private[operators] val HllLinearSqlList: String =
    HllLinearTable.map(x => String.format(java.util.Locale.ROOT, "%.17g", Double.box(x)))
      .mkString("[", ", ", "]")

  def q34HllDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val h = expr(hllHashSql("l_partkey"))
    val b = li.select($"l_returnflag", (h % HllM).as("bucket"),
      expr(s"(${hllHashSql("l_partkey")}) DIV $HllM").as("v"))
    val rho = when($"v" === 0L, lit(HllMaxRho))
      .otherwise(lit(HllMaxRho) - length(bin($"v")))
    val regs = b.select($"l_returnflag", $"bucket", rho.as("rho"))
      .groupBy($"l_returnflag", $"bucket").agg(max($"rho").as("r"))
    val g = regs.groupBy($"l_returnflag").agg(
      sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), r)").cast("double")).as("occ"),
      count(lit(1)).as("nb"))
    val raw = lit(HllAlphaM2) / ($"occ" + (lit(HllM) - $"nb").cast("double"))
    val linArr = array(HllLinearTable.map(lit): _*)
    val est = when(raw <= lit(2.5 * HllM) && $"nb" < lit(HllM.toLong),
        element_at(linArr, (lit(HllM) - $"nb").cast("int")))
      .otherwise(raw)
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_exact"))
    g.join(exact, "l_returnflag")
      .select($"l_returnflag", $"n_exact",
        round(est, 4).as("hll_estimate"),
        round(est / $"n_exact", 4).as("ratio"))
      .orderBy($"l_returnflag")
  }

  /** q61: HLL register-merge rollup — the mergeability proof that makes
    * sketches THE 100 TB distinct-count plan. Per-group registers (the
    * q34 build, computed ONCE and materialized) roll up to the global
    * estimate by elementwise `max` over the 256-row register frames —
    * the corpus is never rescanned for the higher level, and at cluster
    * scale this is exactly how per-shard sketches combine: only
    * registers cross the wire, O(m · groups) bytes total regardless of
    * data volume. Every register term 1/2^r is an exact power of two
    * and partial sums stay multiples of 2^-23 below 2^8 (31 mantissa
    * bits), so the occupancy sum is EXACT in IEEE double in any
    * accumulation order — the estimate is partitioning- and
    * engine-independent without any quantization step. The exact
    * per-scope distinct beside it is the shuffle the sketch replaces;
    * the spec pins merged('ALL') == the direct global build. */
  def q61HllMerge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val h = expr(hllHashSql("l_partkey"))
    val b = li.select($"l_returnflag", (h % HllM).as("bucket"),
      expr(s"(${hllHashSql("l_partkey")}) DIV $HllM").as("v"))
    val rho = when($"v" === 0L, lit(HllMaxRho))
      .otherwise(lit(HllMaxRho) - length(bin($"v")))
    val regs = b.select($"l_returnflag", $"bucket", rho.as("rho"))
      .groupBy($"l_returnflag", $"bucket").agg(max($"rho").as("r"))
      .materialize()
    val scoped = regs.select($"l_returnflag".as("scope"), $"bucket", $"r")
      .union(regs.groupBy($"bucket").agg(max($"r").as("r"))
        .select(lit("ALL").as("scope"), $"bucket", $"r"))
    val g = scoped.groupBy($"scope").agg(
      sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), r)").cast("double")).as("occ"),
      count(lit(1)).as("nb"))
    val raw = lit(HllAlphaM2) / ($"occ" + (lit(HllM) - $"nb").cast("double"))
    val linArr = array(HllLinearTable.map(lit): _*)
    val est = when(raw <= lit(2.5 * HllM) && $"nb" < lit(HllM.toLong),
        element_at(linArr, (lit(HllM) - $"nb").cast("int")))
      .otherwise(raw)
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_exact"))
      .select($"l_returnflag".as("scope"), $"n_exact")
      .union(li.agg(countDistinct($"l_partkey").as("n_exact"))
        .select(lit("ALL").as("scope"), $"n_exact"))
    g.join(exact, "scope")
      .select($"scope", $"n_exact",
        round(est, 4).as("hll_estimate"),
        round(est / $"n_exact", 4).as("ratio"))
      .orderBy($"scope")
  }

  /** Count-Min geometry: 4 independent rows × 256 counters (8 KB of
    * longs). Row-hash multipliers are the classic public mixing primes
    * (Knuth 2654435761; xxHash 2246822519 / 3266489917 / 668265263). */
  val CmsD = 4
  val CmsW = 256L
  val CmsA: Seq[Long] = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
  private[graft] def cmsB(r: Int): Long = r * 7919L + 13L

  /** Row-r CMS bucket of key expression `k`, as portable SQL: reduce mod
    * P first (|k mod P|·A < 3.3·10¹⁸ stays in BIGINT for any input), then
    * an affine row hash mod P, then the counter index mod w.
    *
    * `pmod` (not `%`) for the row hash so the bucket agrees with
    * [[graft.functions.Aggregators.CmsSketch.bucket]]'s floorMod on the
    * FULL Long domain: (k % P)·A + b is congruent mod P to
    * floorMod(k,P)·A + b, so pmod picks the same non-negative
    * representative the UDAF buckets by — a probe built from this
    * expression reads the cell the sketch incremented even for negative
    * keys (a truncating `%` read a different cell, silently voiding the
    * never-undercount bound through [[graft.streaming.EventStreams
    * .watchedUserRates]]). The final `% $CmsW` sees a non-negative value,
    * so truncation == floor there. The q35 DuckDB oracle keeps plain `%`
    * — identical for the gated non-negative keys. */
  private[graft] def cmsBucketSql(k: String, r: Int): String =
    s"pmod(($k % ${Portable.P}) * ${CmsA(r)} + ${cmsB(r)}, ${Portable.P}) % $CmsW"

  /** q35: heavy-hitter users over the events stream via a Count-Min
    * frequency sketch, beside the exact per-key count. The declarative
    * sketch is two hash aggregates: posexplode each event into its d
    * (row, bucket) cells (map-combinable count per cell — the counter
    * table is at most d·w = 1024 rows TOTAL, independent of event or key
    * cardinality), then probe each candidate key's d cells and take the
    * min. The counter table broadcasts; the exact `groupBy(key).count`
    * beside it is the per-key shuffle the sketch exists to avoid — at
    * 100 TB only the sketch's O(d·w)-bytes-per-map-task plan survives,
    * and the gate proves estimate ≥ exact (CMS never undercounts).
    * Production single-pass path: [[graft.functions.Aggregators.CmsSketch]]
    * (one d·w-long buffer per map task, elementwise-sum merge), verified
    * cell-identical to this formulation in SketchAndScaleSpec. */
  def q35CmsTopk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = graft.core.Tables.events(s, d).select($"user_id")
    val cells = array((0 until CmsD).map(r =>
      expr(cmsBucketSql("user_id", r))): _*)
    val counters = ev.select(posexplode(cells).as(Seq("r", "bucket")))
      .groupBy($"r", $"bucket").agg(count(lit(1)).as("cnt"))
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    val probes = exact.select($"user_id", $"n_events",
      posexplode(cells).as(Seq("r", "bucket")))
    val est = probes.join(broadcast(counters), Seq("r", "bucket"))
      .groupBy($"user_id", $"n_events").agg(min($"cnt").as("cms_estimate"))
    est.orderBy($"n_events".desc, $"user_id").limit(20)
      .select($"user_id", $"n_events", $"cms_estimate",
        ($"cms_estimate" - $"n_events").as("overcount"))
      .orderBy($"user_id")
  }

  /** q36: approximate quantiles via a log₂-binned histogram sketch — the
    * quantile member of the sketch family (distinct = q29 KMV / q34 HLL,
    * frequency = q35 CMS). The classic mergeable quantile sketches
    * (GK, t-digest) are merge-ORDER-dependent, so their results aren't
    * reproducible across partitionings, let alone engines; the fixed-bin
    * histogram is both: state is a count per power-of-two bin (≤ 64 longs
    * per group, map-combinable hash aggregate — the exact
    * `percentile()` beside it buffers every value per group), merge is
    * elementwise sum, and the answer depends only on the multiset. The
    * estimate (the target rank's bin lower bound) is within 2× of the
    * true order statistic by construction — the within-bin guarantee the
    * spec asserts. Bin = bit length of the integer-cents value (`bin()`,
    * the same libm-free log₂ used by q34's rho); rank = ceil(q·N) in
    * integer arithmetic; the cumulative walk is a tiny per-group window
    * over ≤ 64 bin rows.
    *
    * The gated query emits ONLY the sketch: an exact `percentile()`
    * comparison column (the q29/q34/q35 pattern) would itself be a
    * SortAggregate buffering every near-unique value per group — the
    * very plan the sketch exists to avoid, and it dominated the bench.
    * The sketch-vs-exact 2× bound proof lives in [[SketchAndScaleSpec]]
    * at small SF instead. */
  def q36HistQuantiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val cents = expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
    val hist = li.select($"l_returnflag", length(bin(cents)).cast("long").as("b"))
      .groupBy($"l_returnflag", $"b").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"l_returnflag").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum($"cnt").over(w))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"l_returnflag")))
    def estQ(pct: Int) = min(when(
      $"cum" >= expr(s"(n * $pct + 99) DIV 100"), $"b"))
    val sk = cum.groupBy($"l_returnflag").agg(
      max($"n").as("n_rows"),
      estQ(50).as("b50"), estQ(90).as("b90"), estQ(99).as("b99"))
    // 2^(b-1) cents (the bin's lower bound) in dollars: one exact shift,
    // one IEEE division — bit-identical cross-engine.
    def dollars(bCol: String) =
      // CAST the divisor: a bare 100.0 is a DECIMAL literal in Spark SQL
      // and would make the division decimal, not the IEEE double op.
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST($bCol AS INT) - 1) / CAST(100 AS DOUBLE)")
    sk.select($"l_returnflag", $"n_rows",
        dollars("b50").as("hist_p50"),
        dollars("b90").as("hist_p90"),
        dollars("b99").as("hist_p99"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "q29_kmv_distinct" -> q29KmvDistinct,
    "q34_hll_distinct" -> q34HllDistinct,
    "q35_cms_topk" -> q35CmsTopk,
    "q36_hist_quantiles" -> q36HistQuantiles,
    "q61_hll_merge" -> q61HllMerge)

  val oracle: Map[String, String] = Map(
    "q29_kmv_distinct" ->
      s"""WITH hs AS (SELECT DISTINCT l_returnflag,
         |    (l_orderkey * 2654435761) % ${Portable.P} AS h FROM lineitem),
         |topk AS (SELECT * FROM (SELECT l_returnflag, h,
         |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
         |  FROM hs) x WHERE rn <= $K),
         |sk AS (SELECT l_returnflag, count(*) AS n_kept, max(h) AS kth
         |  FROM topk GROUP BY l_returnflag),
         |ex AS (SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_exact
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT sk.l_returnflag, n_exact,
         |  CAST(CASE WHEN n_kept < $K THEN n_kept
         |       ELSE (${(K - 1).toLong * Portable.P} // kth) END AS BIGINT)
         |    AS kmv_estimate,
         |  round(CAST(CASE WHEN n_kept < $K THEN n_kept
         |       ELSE (${(K - 1).toLong * Portable.P} // kth) END AS BIGINT)
         |    / CAST(n_exact AS DOUBLE), 4) AS ratio
         |FROM sk JOIN ex USING (l_returnflag) ORDER BY l_returnflag""".stripMargin,
    "q34_hll_distinct" ->
      s"""WITH h AS (SELECT l_returnflag,
         |    ${hllHashSql("l_partkey")} AS h FROM lineitem),
         |b AS (SELECT l_returnflag, h % $HllM AS bucket, h // $HllM AS v FROM h),
         |r AS (SELECT l_returnflag, bucket,
         |    max(CASE WHEN v = 0 THEN $HllMaxRho
         |        ELSE $HllMaxRho - length(bin(v)) END) AS r
         |  FROM b GROUP BY l_returnflag, bucket),
         |g AS (SELECT l_returnflag,
         |    sum(1.0/CAST(CAST(1 AS BIGINT) << r AS DOUBLE)) AS occ,
         |    count(*) AS nb
         |  FROM r GROUP BY l_returnflag),
         |e0 AS (SELECT l_returnflag, nb,
         |    $HllAlphaM2Sql/(occ + CAST($HllM - nb AS DOUBLE)) AS raw FROM g),
         |e AS (SELECT l_returnflag,
         |    CASE WHEN raw <= CAST(${(2.5 * HllM).toInt} AS DOUBLE) AND nb < $HllM
         |         THEN ($HllLinearSqlList)[CAST($HllM - nb AS INT)]
         |         ELSE raw END AS est FROM e0),
         |ex AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT e.l_returnflag, n_exact,
         |  round(est, 4) AS hll_estimate,
         |  round(est/n_exact, 4) AS ratio
         |FROM e JOIN ex USING (l_returnflag) ORDER BY l_returnflag""".stripMargin,
    "q61_hll_merge" ->
      s"""WITH h AS (SELECT l_returnflag,
         |    ${hllHashSql("l_partkey")} AS h FROM lineitem),
         |b AS (SELECT l_returnflag, h % $HllM AS bucket, h // $HllM AS v FROM h),
         |r AS (SELECT l_returnflag, bucket,
         |    max(CASE WHEN v = 0 THEN $HllMaxRho
         |        ELSE $HllMaxRho - length(bin(v)) END) AS r
         |  FROM b GROUP BY l_returnflag, bucket),
         |ru AS (SELECT l_returnflag AS scope, bucket, r FROM r
         |  UNION ALL SELECT 'ALL', bucket, max(r) FROM r GROUP BY bucket),
         |g AS (SELECT scope,
         |    sum(1.0/CAST(CAST(1 AS BIGINT) << r AS DOUBLE)) AS occ,
         |    count(*) AS nb
         |  FROM ru GROUP BY scope),
         |e0 AS (SELECT scope, nb,
         |    $HllAlphaM2Sql/(occ + CAST($HllM - nb AS DOUBLE)) AS raw FROM g),
         |e AS (SELECT scope,
         |    CASE WHEN raw <= CAST(${(2.5 * HllM).toInt} AS DOUBLE) AND nb < $HllM
         |         THEN ($HllLinearSqlList)[CAST($HllM - nb AS INT)]
         |         ELSE raw END AS est FROM e0),
         |ex AS (SELECT l_returnflag AS scope, count(DISTINCT l_partkey) AS n_exact
         |  FROM lineitem GROUP BY l_returnflag
         |  UNION ALL SELECT 'ALL', count(DISTINCT l_partkey) FROM lineitem)
         |SELECT e.scope, n_exact,
         |  round(est, 4) AS hll_estimate,
         |  round(est/n_exact, 4) AS ratio
         |FROM e JOIN ex USING (scope) ORDER BY scope""".stripMargin,
    "q35_cms_topk" -> {
      val rowsCte = (0 until CmsD).map(r =>
        s"SELECT $r AS r, ${CmsA(r)} AS a, ${cmsB(r)} AS b").mkString(" UNION ALL ")
      val bucket = s"(((user_id % ${Portable.P}) * a + b) % ${Portable.P}) % $CmsW"
      s"""WITH rows AS ($rowsCte),
         |pr AS (SELECT user_id, r, $bucket AS bucket FROM events, rows),
         |ctr AS (SELECT r, bucket, count(*) AS cnt FROM pr GROUP BY r, bucket),
         |ex AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
         |prb AS (SELECT user_id, n_events, r, $bucket AS bucket FROM ex, rows),
         |est AS (SELECT user_id, n_events, min(cnt) AS cms_estimate
         |  FROM prb JOIN ctr USING (r, bucket) GROUP BY user_id, n_events),
         |top AS (SELECT * FROM est ORDER BY n_events DESC, user_id LIMIT 20)
         |SELECT user_id, n_events, cms_estimate,
         |  CAST(cms_estimate - n_events AS BIGINT) AS overcount
         |FROM top ORDER BY user_id""".stripMargin
    },
    "q36_hist_quantiles" -> {
      def bq(pct: Int) =
        s"min(CASE WHEN cum >= (n * $pct + 99) // 100 THEN b END) AS b$pct"
      s"""WITH h AS (SELECT l_returnflag,
         |    CAST(length(bin(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))) AS BIGINT) AS b
         |  FROM lineitem),
         |hist AS (SELECT l_returnflag, b, count(*) AS cnt FROM h GROUP BY l_returnflag, b),
         |c AS (SELECT l_returnflag, b,
         |    CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY b
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |    CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
         |  FROM hist),
         |sk AS (SELECT l_returnflag, max(n) AS n_rows,
         |    ${bq(50)}, ${bq(90)}, ${bq(99)}
         |  FROM c GROUP BY l_returnflag)
         |SELECT l_returnflag, n_rows,
         |  (CAST(1 AS BIGINT) << (b50 - 1)) / 100.0 AS hist_p50,
         |  (CAST(1 AS BIGINT) << (b90 - 1)) / 100.0 AS hist_p90,
         |  (CAST(1 AS BIGINT) << (b99 - 1)) / 100.0 AS hist_p99
         |FROM sk ORDER BY l_returnflag""".stripMargin
    })
}
