package graft.graph

import org.apache.spark.sql.DataFrame

/** Superstep/state materialization with a pluggable durability mode.
  *
  * Every iterative path in the engine (BSP loops, Borůvka contraction,
  * SCC rounds, k-core peeling, Brandes levels, Lloyd's iterations) must
  * truncate lineage each round — a lazy k-step plan that references the
  * previous state twice is a ~2^k recompute tree (measured 239 s →
  * seconds, SURVEY §6). HOW the truncation is made durable is a
  * deployment decision:
  *
  *  - '''Local''' (default): `localCheckpoint(eager)` — blocks live in
  *    executor storage. Fastest, and exactly right for `local[*]` where
  *    executor == driver. On a real cluster a lost executor loses its
  *    blocks AND the lineage that could recompute them: a 40-round SCC
  *    job dies with no recovery path.
  *  - '''Reliable''': `df.checkpoint(eager)` against the Spark
  *    checkpoint dir — state survives executor loss, the standard
  *    durability mode for long iterative jobs at cluster scale (the
  *    reference's equivalent "durability" is rerunning the MPI binary,
  *    `/root/reference/gmr.cpp:202-317` assumes restartability).
  *
  * Mode is per-session Spark conf (runtime-settable, no code change):
  * {{{
  * spark.conf.set("spark.graft.checkpoint.reliable", "true")
  * spark.conf.set("spark.graft.checkpoint.dir", "hdfs://.../ckpt")
  * }}}
  * Both modes are eager and semantically identical — ReliableCheckpointSpec
  * runs the same queries under both and asserts equal results.
  */
object Materialize {

  val ReliableKey = "spark.graft.checkpoint.reliable"
  val DirKey = "spark.graft.checkpoint.dir"

  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(ReliableKey).contains("true")

  /** Builder-side plan capture (r21): `spark.graft.explainMaterialize=true`
    * prints the formatted physical plan of every frame right before it is
    * checkpointed. Loop-round plans are invisible in the final query's
    * explain (checkpointing truncates lineage), so this is the instrument
    * that captures a loop's per-round join/exchange shape; never set by
    * the driver (one string conf lookup per materialize when off). */
  private val ExplainKey = "spark.graft.explainMaterialize"

  /** Eagerly materialize `df` and truncate its lineage, honoring the
    * session's durability mode. */
  def apply(df: DataFrame): DataFrame = {
    if (df.sparkSession.conf.getOption(ExplainKey).contains("true"))
      df.explain("formatted")
    if (reliable(df)) {
      val sc = df.sparkSession.sparkContext
      val want = df.sparkSession.conf.getOption(DirKey).getOrElse(
        sys.props("java.io.tmpdir") + "/graft-checkpoints")
      // setCheckpointDir creates a session-unique subdir under the
      // requested base, so compare against the base: re-set whenever the
      // configured dir changes mid-session instead of silently ignoring
      // the new value. Checkpoint FILES are only reclaimed when
      // spark.cleaner.referenceTracking.cleanCheckpoints=true (a
      // startup-time conf — GraftSession sets it); long iterative jobs
      // otherwise accumulate unbounded checkpoint data.
      if (!sc.getCheckpointDir.exists(_.startsWith(want)))
        sc.setCheckpointDir(want)
      df.checkpoint() // eager, written to the checkpoint dir
    } else df.localCheckpoint(true)
  }

  /** `df.materialize()` — chainable form of [[Materialize.apply]]. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialize(): DataFrame = Materialize(df)
  }
}
