package graft.operators

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

  val queries: Map[String, Q] = Map(
    "q29_kmv_distinct" -> q29KmvDistinct)

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
         |FROM sk JOIN ex USING (l_returnflag) ORDER BY l_returnflag""".stripMargin)
}
