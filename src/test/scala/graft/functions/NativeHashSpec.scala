package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native kernels must be bit-identical to the HOF formulations they
  * replaced (whose DuckDB twins the round-1 oracle gate already proved) —
  * each test evaluates both forms side by side on edge-case-rich input:
  * empty strings, leading/consecutive/trailing spaces (empty word
  * tokens), docs shorter than k, duplicate shingles. */
class NativeHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val samples = Seq(
    "", " ", "  ", "a", "hello world", "one two three four five",
    "a  b c", " leading", "trailing ", "x y x y x y x y",
    "the quick brown fox jumps over the lazy dog",
    "dup dup dup dup", "ab", "a b")

  private def docs = {
    import spark.implicits._
    samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  /** The round-1 interpreted fold (kept here as the spec of charHash). */
  private def hofCharHash(s: org.apache.spark.sql.Column) =
    aggregate(filter(split(s, ""), c => c =!= ""), lit(0L),
      (acc, c) => (acc * lit(31L) + ascii(c).cast("long")) % lit(Portable.P))

  test("native char hash == HOF ascii fold") {
    val rows = docs.select(
      Portable.charHash(col("text")).as("native"),
      hofCharHash(col("text")).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r))
  }

  test("native shingle hashes == array_distinct(transform(shingles, charHash))") {
    for (k <- Seq(1, 2, 3, 5)) {
      val rows = docs.select(col("text"),
        Portable.shingleHashes(col("text"), k).as("native"),
        array_distinct(transform(
          Portable.shingles(Portable.words(col("text")), k),
          s => hofCharHash(s))).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"k=$k text='${r.getString(0)}'")
      }
    }
  }

  test("native word hashes == transform(words, charHash)") {
    val rows = docs.select(
      Portable.wordHashes(col("text")).as("native"),
      transform(Portable.words(col("text")), w => hofCharHash(w)).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("native minhash band sigs == explode × perm-table groupBy formulation") {
    val numPerms = 8; val bands = 4; val r = numPerms / bands
    val sets = docs.select(col("id"), Portable.shingleHashes(col("text"), 2).as("sh"))
      .where(size(col("sh")) > 0)
    val native = sets.select(col("id"),
        posexplode(call_function("graft_minhash_bands", col("sh"), lit(numPerms), lit(bands)))
          .as(Seq("band", "sig")))
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x.getLong(2)).toMap
    // round-1 relational formulation
    val perms = broadcast(spark.range(numPerms).select(
      col("id").as("perm"),
      (((col("id") + 1) * HashUtil.PermA + 7) % Portable.P).as("a"),
      (((col("id") + 1) * HashUtil.PermB + 3) % Portable.P).as("b")))
    val relational = sets.select(col("id"), explode(col("sh")).as("h"))
      .crossJoin(perms)
      .groupBy(col("id"), col("perm"))
      .agg(min((col("a") * col("h") + col("b")) % Portable.P).as("minv"))
      .withColumn("band", (col("perm") / r).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(Portable.longFold(
        transform(array_sort(collect_list(struct(col("perm"), col("minv")))),
          s => s.getField("minv"))).as("sig"))
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(native === relational)
  }

  test("native minhash mins == explode × perm-table groupBy minima") {
    val numPerms = 8
    val sets = docs.select(col("id"), Portable.shingleHashes(col("text"), 2).as("sh"))
      .where(size(col("sh")) > 0)
    val native = sets.select(col("id"),
        posexplode(call_function("graft_minhash_mins", col("sh"), lit(numPerms)))
          .as(Seq("perm", "minv")))
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x.getLong(2)).toMap
    val perms = broadcast(spark.range(numPerms).select(
      col("id").as("perm"),
      (((col("id") + 1) * HashUtil.PermA + 7) % Portable.P).as("a"),
      (((col("id") + 1) * HashUtil.PermB + 3) % Portable.P).as("b")))
    val relational = sets.select(col("id"), explode(col("sh")).as("h"))
      .crossJoin(perms)
      .groupBy(col("id"), col("perm"))
      .agg(min((col("a") * col("h") + col("b")) % Portable.P).as("minv"))
      .collect().map(x => (x.getLong(0), x.getLong(1).toInt) -> x.getLong(2)).toMap
    assert(native === relational)
  }

  test("native simhash == relational tf × bit-table formulation") {
    val native = docs.select(col("id"), call_function("graft_simhash", col("text")))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    import spark.implicits._
    val tf = docs.select(col("id"), explode(Portable.words(col("text"))).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
      // 60-bit word key: plain fold (low 30) + salt-prefixed fold
      // (high 30) — the exact composition the native kernel computes.
      .select(col("id"),
        (hofCharHash(col("w")) + shiftleft(
          hofCharHash(concat(lit(HashUtil.SimSalt), col("w"))), 30)).as("h"),
        col("tf"))
    val bits = broadcast((0 until SimHashW.bits).map(j => (j, 1L << j)).toDF("j", "bitval"))
    val relational = tf.crossJoin(bits)
      .select(col("id"), col("j"), col("bitval"),
        (col("tf") * when(col("h").bitwiseAND(col("bitval")) =!= 0L, lit(1L))
          .otherwise(lit(-1L))).as("wgt"))
      .groupBy(col("id"), col("j"), col("bitval")).agg(sum(col("wgt")).as("s"))
      .groupBy(col("id"))
      .agg(sum(when(col("s") > 0, col("bitval")).otherwise(lit(0L))).as("simhash"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(native === relational)
  }

  test("sorted intersect count == size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val pairs = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L), Seq(4L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    val rows = pairs.select(
      call_function("graft_sorted_intersect_count", col("a"), col("b")),
      size(array_intersect(col("a"), col("b"))).cast("long")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("vec dot matches the HOF zip fold bit-for-bit") {
    import spark.implicits._
    val vs = Seq(
      (Seq(0.1, 0.2, 0.3), Seq(1.0, -2.0, 0.5)),
      (Seq(1e-9, 1e9, -1e-9), Seq(3.0, 1e-9, 2.0))).toDF("a", "b")
    val rows = vs.select(
      Portable.vecDot(col("a"), col("b")),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x))
      .collect()
    rows.foreach(r => assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
      java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("rep stats kernel == explode + group-by formulation") {
    import spark.implicits._
    val uw = docs.select(col("id"), explode(Portable.words(col("text"))).as("t"))
    val aw = uw.groupBy("id", "t").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("topw"),
        sum(col("c")).as("nw"), count(lit(1)).as("ndw"))
    val ub = docs.select(col("id"),
      explode(Portable.shingles(Portable.words(col("text")), 2)).as("t"))
    val ab = ub.groupBy("id", "t").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("topb"), sum(col("c")).as("nb"))
    val relational = aw.join(ab, Seq("id"), "left_outer")
      .select(col("id"), col("nw"), col("topw"), col("ndw"),
        coalesce(col("topb"), lit(0L)).as("topb"),
        coalesce(col("nb"), lit(0L)).as("nb"))
      .collect().map(r => r.getLong(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val native = docs
      .select(col("id"), call_function("graft_rep_stats", col("text")).as("st"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === relational)
  }
}

/** Bits constant accessor (avoids importing graft.dedup into functions). */
private object SimHashW { val bits: Int = HashUtil.SimHashBits }
