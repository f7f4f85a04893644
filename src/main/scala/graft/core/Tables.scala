package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-provided TPC-H-ish testdata
  * (see /root/repo/TESTDATA.md). All engine queries take an `sfDir`
  * and resolve tables through here so the scan is a plain parquet
  * FileScan — Catalyst pushes filters/projections into it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTimestamps(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** The driver's generator has shipped timestamp columns as both
    * TIMESTAMP(NANOS) (read as long under nanosAsLong) and plain
    * TIMESTAMP_NTZ(MICROS) across rounds. Downstream operators use
    * session-time functions (`unix_micros`, `to_timestamp` literals)
    * that require TIMESTAMP, so normalize every NTZ column to TIMESTAMP
    * here. The session timezone is pinned to UTC ([[GraftSession]]), so
    * the cast is epoch-preserving and matches DuckDB's naive reading of
    * the same parquet. Row-local projection — nothing physical changes. */
  private def normalizeTimestamps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampNTZType
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else ntz.foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast("timestamp")))
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 only reads as a
    * long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    * [[GraftSession]]). Normalize to a microsecond timestamp here with
    * integer division (a double division would lose precision on ~1.7e18
    * nanosecond values). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = apply(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
