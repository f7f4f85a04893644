package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected
  * queries so shuffle count, pushed filters, broadcast choices and
  * whole-stage-codegen spans can be reviewed (`runMain graft.Explain
  * [sfDir] [query...]`). Not part of the driver contract. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_shipping_summary", "q2_revenue_by_nation", "q14_global_sort",
        "g1_pagerank", "d3_minhash_lsh", "s1_ann_bruteforce")
    val spark = graft.core.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
