package graft.core

/** Per-query PHASE wall-clock registry — the g19/g29 leg instrumentation
  * VERDICT r20/r21 asked for (write/read/stats splits surfaced in the
  * bench artifact so a burst draw names its leg without a same-window
  * A/B). Operators wrap their EAGER legs (the subgraph write, the
  * locality assignment build) in [[record]]; [[Bench]] snapshots the
  * registry once at the end and emits it as the top-level
  * `phase_legs` field of bench_full.json — the flat `queries` map and
  * the stdout line are untouched, so the driver contract is unchanged.
  *
  * Semantics: merge-by-REPLACE, not accumulate — a min-of-two query
  * (g19/g29) leaves its LAST run's legs in the registry, which is the
  * warm run the min usually selects. Legs that only exist inside the
  * final lazy action (stats/read/triangle) are NOT split here: splitting
  * them would require extra actions inside the timed region, changing
  * the measured computation. The residual (query total − recorded eager
  * legs) is the finish-action cost by construction. */
object Phase {

  private val log =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Record `f`'s wall seconds under `key` (e.g. "g19.write"),
    * replacing any earlier value for the key. */
  def record[T](key: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f finally log.put(key, (System.nanoTime() - t0) / 1e9)
  }

  /** Snapshot of recorded legs by key. */
  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    log.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }
}
