package graft.core

import org.apache.spark.sql.SparkSession

/** Standard engine session configuration. One place so Verify, Bench and
  * tests all run with the same semantics:
  *  - shuffle partitions sized to local cores (not the 200 default);
  *  - AQE on (runtime coalescing, skew-join splitting, broadcast demotion);
  *  - UTC session timezone for oracle parity;
  *  - nanosecond parquet timestamps read as long (events.ts is
  *    TIMESTAMP(NANOS), which Spark 4 otherwise refuses) — normalized back
  *    to a timestamp column by [[Tables.events]].
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions())
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reclaim reliable-checkpoint files once their RDDs are GC'd —
      // required for long iterative jobs under
      // spark.graft.checkpoint.reliable=true (Materialize); startup-time
      // conf, so it must be set here, not at checkpoint time
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")

  def get(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
