package graft

/** Builder-side microbench: d2 cold + warm on SPARK_GRAFT_SF_DIR (the
  * warm delta isolates the cache-fill + AQE stage floor from steady
  * compute). Not part of the driver contract. */
object D2Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](l: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f
      println(f"[d2probe] $l%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r }
    t("d2 cold") {
      graft.operators.DedupQueries.d2NgramJaccard(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    t("d2 warm") {
      graft.operators.DedupQueries.d2NgramJaccard(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
