package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HashUtil, Portable}

/** Z-order layout: kernel correctness (vs a local reference), the
  * monotonicity/superset properties the q46 box prefilter relies on, and
  * the actual file-skipping effect of [[Layout.writeZOrdered]] — files
  * laid out by Morton key have tight min/max ranges on BOTH dimensions,
  * so a box on either one prunes most files, where a single-column sort
  * prunes only its own sort key. */
class ZOrderLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  /** Bit-by-bit local reference (independent of the shift-loop kernel). */
  private def ref(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("graft_zorder equals the reference over a grid, from SQL and Column APIs") {
    import spark.implicits._
    val grid = for { x <- 0L to 40L; y <- 0L to 40L } yield (x, y)
    val got = grid.toDF("x", "y")
      .select($"x", $"y", Portable.zorder($"x", $"y", 20).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) === ref(x, y, 20), s"($x,$y)")
      assert(got((x, y)) === HashUtil.interleaveBits(x, y, 20))
    }
    // SQL face
    val viaSql = spark.sql("SELECT graft_zorder(5, 9, 20)").head().getLong(0)
    assert(viaSql === ref(5, 9, 20))
  }

  test("monotone per coordinate; box collapses to one superset z-range") {
    // deterministic LCG points/boxes, pure local arithmetic
    var seed = 12345L
    def next(n: Long): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; seed % n }
    (1 to 500).foreach { _ =>
      val (x, y) = (next(1 << 16), next(1 << 16))
      assert(HashUtil.interleaveBits(x + 1, y, 20) > HashUtil.interleaveBits(x, y, 20))
      assert(HashUtil.interleaveBits(x, y + 1, 20) > HashUtil.interleaveBits(x, y, 20))
    }
    (1 to 200).foreach { _ =>
      val x0 = next(1 << 15); val x1 = x0 + 1 + next(1 << 10)
      val y0 = next(1 << 15); val y1 = y0 + 1 + next(1 << 10)
      val (zlo, zhi) = (HashUtil.interleaveBits(x0, y0, 20), HashUtil.interleaveBits(x1, y1, 20))
      (1 to 20).foreach { _ =>
        val px = x0 + next(x1 - x0 + 1); val py = y0 + next(y1 - y0 + 1)
        val z = HashUtil.interleaveBits(px, py, 20)
        assert(z >= zlo && z <= zhi, s"($px,$py) escaped box [$x0,$x1]x[$y0,$y1]")
      }
    }
  }

  private def filesIntersecting(path: String, dim: String, lo: Long, hi: Long): (Int, Int) = {
    val ranges = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min(col(dim)).as("lo"), max(col(dim)).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    (ranges.count(r => r._1 <= hi && r._2 >= lo), ranges.length)
  }

  test("z-ordered files prune on either dimension; linear sort only on its key") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val zDir = "/tmp/graft_layout_z"
    val linDir = "/tmp/graft_layout_linear"
    Layout.writeZOrdered(li, col("l_orderkey"), col("l_partkey"), 20, 16, zDir)
    li.repartitionByRange(16, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linDir)

    // layout preserves content exactly
    val n0 = li.count()
    assert(spark.read.parquet(zDir).count() === n0)

    // partkey box (5% of the partkey domain): the linear layout reads
    // everything, the z layout skips most files
    val (zPart, zTot) = filesIntersecting(zDir, "l_partkey", 100, 199)
    val (linPart, linTot) = filesIntersecting(linDir, "l_partkey", 100, 199)
    assert(linPart === linTot, "orderkey-sorted files can't prune a partkey box")
    assert(zPart * 2 <= zTot, s"z layout should skip >=half the files, hit $zPart/$zTot")

    // orderkey box: both layouts prune (linear perfectly, z partially)
    val (zOrd, _) = filesIntersecting(zDir, "l_orderkey", 0, 999)
    val (linOrd, _) = filesIntersecting(linDir, "l_orderkey", 0, 999)
    assert(linOrd <= 2)
    assert(zOrd < zTot, "z layout must still prune an orderkey box")
    info(s"partkey box: z-layout $zPart/$zTot files vs linear $linPart/$linTot; " +
      s"orderkey box: z-layout $zOrd vs linear $linOrd")
  }
}
