package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side scale probe (VERDICT r5 item 7): measure the growth
  * curve of the bucketed designs from sf0.1 to a synthetic sf1.
  *
  * sf1 inputs are derived from the driver's sf0.1 tables by 10×
  * replication with id offsets; each document copy is prefixed with a
  * distinct copy token so near-dup structure repeats per copy instead
  * of collapsing into 10-way duplicate groups (which would measure an
  * unrepresentative quadratic blowup *inside* dup groups, not the
  * pipeline's scaling). Lineitem copies offset both orderkey and
  * partkey, giving 10 disjoint co-purchase graphs — linear vertex/edge
  * growth. This is a TIMING probe, not a correctness gate: outputs are
  * only counted.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.GScale"
  * Prints per-query seconds at sf0.1 and sf1 and the ratio; near-linear
  * (≤ ~12× for 10× data on a fixed 32-thread box) is the pass bar.
  */
object GScale {

  private val Copies = 10

  /** Unrecorded JVM warmup that touches a scan, a hash projection, and
    * a small shuffle WITHOUT running any probe: the earlier convention
    * of warming with the head probe itself also wrote that probe's
    * derive-once parquet artifacts, so its recorded small-SF leg read a
    * warm cache while the large-SF leg paid the full cold build — the
    * printed ratio then conflated cache state with scaling (caught in
    * the r8 self-review; the first d3 sf10 reading of 225× was exactly
    * this). Derive-once builds are now billed to whichever RECORDED run
    * hits them first, identically on both sides. */
  /** Sf10 probe's both-sides-cold guarantee — shared with the per-round
    * Bench since r11 (see [[graft.core.Derived.wipeFor]]). */
  private def wipeDerived(dirs: Seq[String]): Unit =
    graft.core.Derived.wipeFor(dirs)

  private def neutralWarmup(spark: SparkSession, dir: String): Unit = {
    spark.read.parquet(s"$dir/lineitem.parquet").limit(1000).count()
    spark.read.parquet(s"$dir/documents.parquet").limit(200)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .groupBy("h").count().count()
  }

  /** Two-decade validation (`runMain graft.GScale sf10`, VERDICT r7
    * item 4): replicate the synthetic sf1 another 10× → sf10 = 100× the
    * driver's sf0.1, and probe just the derived-constant knobs
    * (d3 bands, s9 signature width, s15 derived k, g1) to confirm the
    * log-scaling holds across two decades, not just the one the sf1
    * sweep measured. Offsets continue the sf1 conventions one decade
    * up; embeddings decorrelate across copies by a per-copy
    * deterministic sign-flip pattern (cosine structure within a copy is
    * invariant under a fixed axis-reflection applied to every vector;
    * cross-copy expected cosine ~0) because the sf1 cyclic-shift trick
    * runs out of distinct shifts past 64 copies.
    *
    * Billing symmetry: the required prior default-GScale sweep already
    * wrote the sf1-side derive-once artifacts (cells, LSH signature and
    * kNN caches keyed by the sf1 tag), so without intervention the
    * recorded sf1 leg would read warm parquet while the sf10 leg paid
    * its full cold build — a ratio that conflates cache state with
    * scaling (ADVICE r8). [[wipeDerived]] therefore deletes every
    * derive-once entry keyed on EITHER dir before the recorded runs:
    * both legs pay the same cold build inside their own recorded run. */
  def sf10Main(): Unit = {
    val spark = graft.core.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sf1 = s"${sys.props("user.dir")}/target/graft_scale/sf1"
    require(new java.io.File(s"$sf1/lineitem.parquet/_SUCCESS").exists(),
      "run the default GScale first to build the sf1 replica")
    val big = s"${sys.props("user.dir")}/target/graft_scale/sf10"
    def replicate(table: String, f: (DataFrame, Int) => DataFrame): Unit = {
      val out = s"$big/$table.parquet"
      if (!new java.io.File(s"$out/_SUCCESS").exists()) {
        val src = spark.read.parquet(s"$sf1/$table.parquet")
        (0 until Copies).map(k => f(src, k)).reduce(_ union _)
          .write.mode("overwrite").parquet(out)
      }
    }
    // Per-decade-copy word bijection, the same convention as the sf1
    // generator (r9): prefix every word of decade copy k > 0 with
    // `d${k}_` (on top of sf1's `c*_` prefixes). A word-level bijection
    // keeps within-copy shingle/tf structure exactly isomorphic while
    // making cross-copy shingle sets disjoint and cross-copy SimHash
    // fingerprints independent — the r8 interleaved-token convention
    // decorrelated shingles but would dominate any tf-weighted
    // fingerprint, and a TRAILING marker correlates polynomial word
    // hashes across copies (see the sf1 generator's comment).
    replicate("documents", (df, k) => df
      .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
      .withColumn("text",
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"d${k}_$$1")))
    // Sign-flip with probability exactly 1/2 per dimension: two copies
    // then differ in sign on E[1/2] of dims, so cross-copy expected
    // cosine is 0 (a 1/3 flip rate leaves E[cos] ≈ 1/3·within-copy —
    // residual correlation that inflates cross-copy LSH collisions and
    // pollutes the scaling probe; caught in the r8 self-review).
    replicate("embeddings", (df, k) => df
      .withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
      .withColumn("embedding",
        if (k == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          when(pmod(xxhash64(i * lit(64) + lit(k)), lit(2)) === 0, -x).otherwise(x))))
    replicate("lineitem", (df, k) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(k * 1000000000L))
      .withColumn("l_partkey", col("l_partkey") + lit(k * 100000000L)))
    val all10 = Seq("s15_semdedup", "d3_minhash_lsh", "d4_simhash",
      "d18_simhash_clusters", "s9_knn_graph", "g1_pagerank")
    val probes = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(s => all10.filter(s.split(",").toSet)).getOrElse(all10)
    def run(dir: String, name: String): Double = {
      spark.sqlContext.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    wipeDerived(Seq(sf1, big))
    neutralWarmup(spark, sf1)
    println(f"[gscale10] ${"query"}%-24s ${"sf1"}%8s ${"sf10"}%8s  ratio")
    probes.foreach { name =>
      val tSmall = run(sf1, name)
      val tBig = run(big, name)
      println(f"[gscale10] $name%-24s $tSmall%8.2f $tBig%8.2f  ${tBig / tSmall}%5.2f")
      if (name == "s9_knn_graph") {
        val cSmall = graft.operators.SimilarityQueries.knnCandidateCount(spark, sf1)
        val cBig = graft.operators.SimilarityQueries.knnCandidateCount(spark, big)
        println(f"[gscale10] s9_candidate_pairs     $cSmall%8d $cBig%8d  ${cBig.toDouble / cSmall}%5.2f")
      }
      if (name == "d18_simhash_clusters") {
        // The O(docs)-output claim across the SECOND decade: cluster
        // rows must track the doc count no matter the pair density.
        val rows = SparkEntry.queries(name)(spark, big).count()
        val docsN = spark.read.parquet(s"$big/documents.parquet").count()
        println(s"[gscale10] d18_rows_vs_docs       $rows <= $docsN: ${rows <= docsN}")
      }
      if (name == "d3_minhash_lsh") {
        val cross = graft.operators.DedupQueries.d3CrossCopyPairs(spark, big, 10000000L)
        println(s"[gscale10] d3_cross_decade_pairs  $cross (must be 0)")
      }
      if (name == "d4_simhash") {
        // Unlike d3's exact-jaccard verify (0 cross-copy at any N), a
        // chance-collision floor grows quadratically in N with the
        // fingerprint width as the knob. The old 30-bit/hamming≤2
        // fingerprint measured 39,150 chance pairs here (≈ pairs ×
        // 466/2³⁰ over ~1.1e11 cross-decade pairs — SURVEY §6.2.1);
        // the r10 60-bit/hamming≤4 widening drops the floor to
        // pairs × C(60,≤4)/2⁶⁰ ≈ 0.05 expected pairs, so the bar is
        // now ≈ 0 — materially above it means either the generator
        // correlates copies again or the width regressed.
        val cross = graft.operators.DedupQueries.d4CrossCopyPairs(spark, big, 10000000L)
        println(s"[gscale10] d4_cross_decade_pairs  $cross (must be ~0 at 60 bits; was 39150 at 30)")
      }
    }
    // Locality-partitioner pipeline across the SECOND decade (the sf1
    // main's probe one decade up): self-contained 5-iteration LPA +
    // LPT assignment + fmt=1111 write over the co-purchase graph.
    if (sys.env.get("SPARK_GRAFT_SCALE_ONLY")
        .forall(_.split(",").toSet.contains("locality"))) {
      // Leg-decomposed (r10): the r9 verdict's two named cost terms are
      // the LPA leg (frontier-incremental this round — was ~39 s/iter
      // full-recompute at sf10) and the write leg (assignment join now
      // broadcast under the budget — hash-mode wrote in 52 s). Timing
      // each leg separately pins both improvements in the artifact.
      def locality(dir: String): Double = {
        spark.sqlContext.clearCache()
        def leg[T](name: String)(f: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = f
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[gscale10] locality_leg_$name%-10s ${new java.io.File(dir).getName}%-5s $dt%8.2f")
          (r, dt)
        }
        val t0 = System.nanoTime()
        val pairs = graft.operators.GraphQueries.partPairsMaterialized(spark, dir)
        val g = graft.graph.PropertyGraph(
          pairs.select(col("src").as("id"))
            .union(pairs.select(col("dst").as("id"))).distinct(),
          graft.graph.PropertyGraph.symmetrize(pairs))
        // labelPropagation's final round materializes eagerly, so the
        // LPA cost lands inside this leg, not in a consumer.
        val (labels, _) = leg("lpa") {
          graft.graph.GraphOps.labelPropagation(g, 5)
            .select(col("id"), col("label"))
        }
        val (assign, _) = leg("assign") {
          graft.io.GraphLoaders.localityAssignment(labels, 3)
        }
        val out = s"${sys.props("user.dir")}/target/graft_scale/locality_probe10/" +
          new java.io.File(dir).getName
        new java.io.File(out).getParentFile.mkdirs()
        leg("write") {
          graft.io.GraphLoaders.writeMetisSubgraphs(g, 3, out, Some(assign))
        }
        (System.nanoTime() - t0) / 1e9
      }
      val tSmall = locality(sf1)
      val tBig = locality(big)
      println(f"[gscale10] locality_partition     $tSmall%8.2f $tBig%8.2f  ${tBig / tSmall}%5.2f")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("sf10")) { sf10Main(); return }
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val big = s"${sys.props("user.dir")}/target/graft_scale/sf1"

    def replicate(table: String, f: (DataFrame, Int) => DataFrame): Unit = {
      val out = s"$big/$table.parquet"
      if (!new java.io.File(s"$out/_SUCCESS").exists()) {
        val src = spark.read.parquet(s"$base/$table.parquet")
        (0 until Copies).map(k => f(src, k)).reduce(_ union _)
          .write.mode("overwrite").parquet(out)
      }
    }
    // documents: offset ids, and apply a PER-COPY WORD BIJECTION — every
    // word of copy k > 0 gets the prefix `c${k}_` (r9, VERDICT r8
    // item 5). Why a bijection and not a tag token: a prepended TAG
    // TOKEN never decorrelates 3-word shingles (copies were genuine
    // jaccard-0.9 near-dups — d3/d4/d18 measured quadratic-in-copies
    // workload density, not plan scaling), and an INTERLEAVED constant
    // token fixes d3 but dominates d4's tf-weighted SimHash (the tag's
    // tf ≈ n/3 outweighs the ~√n random-walk of the real words, so ALL
    // docs within a copy collapse to hamming ≈ 0 — a first attempt at
    // this rebuild produced ~10⁹ verified pairs). Per-word decoration is
    // a word-level bijection per copy: shingle sets map injectively
    // (cross-copy shingles DISJOINT, within-copy jaccard EXACTLY the
    // organic sf0.1 structure) and no token ever dominates a
    // fingerprint. The copy marker must lead the word, not trail it:
    // the word hash is the polynomial (acc·31 + cp) mod P, so a
    // TRAILING marker shifts same-length words' hashes by a tiny
    // constant (copies 1 vs 3 differ by 2 — measured same-doc
    // cross-copy hamming 2.3, 241/400 under the dedup threshold) while
    // a LEADING marker's delta rides B^len through the mod-P wrap
    // (measured hamming 14.5 ≈ independent, 0/400 colliding).
    replicate("documents", (df, k) => df
      .withColumn("doc_id", col("doc_id") + lit(k * 1000000L))
      .withColumn("text",
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"c${k}_$$1")))
    // embeddings: offset vec ids and cyclic-shift each copy's dimensions
    // by k. Cosine is invariant under a permutation applied to BOTH
    // vectors, so every copy's internal neighbor structure is exactly
    // sf0.1's, while cross-copy similarity decorrelates — the same
    // per-copy-disjoint convention as documents' copytag and lineitem's
    // key offsets. (Verbatim replication would make every vector an
    // exact 10-way duplicate: those collide in ANY locality-sensitive
    // scheme at any width, so the probe would measure intra-dup-group
    // quadratic blowup instead of the pipeline's scaling.)
    replicate("embeddings", (df, k) => df
      .withColumn("vec_id", col("vec_id") + lit(k * 1000000L))
      .withColumn("embedding",
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, 64 - k),
          slice(col("embedding"), 1, k))))
    // lineitem: offset order+part keys → 10 disjoint co-purchase graphs.
    replicate("lineitem", (df, k) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(k * 100000000L))
      .withColumn("l_partkey", col("l_partkey") + lit(k * 10000000L)))
    // events: offset event ids and user ids per copy — 10× users over
    // the same day span, so per-day frames grow 10× while the day
    // dimension stays fixed (the realistic growth shape for q64's
    // reach accounting). ts round-trips as raw nanos (Tables.events
    // normalizes either encoding). NOTE: because customer is copied
    // verbatim, only copy-0 events can match a customer key — the q74
    // deletion-cascade probe's events leg therefore measures a 10×-
    // DILUTED affected fraction (its absolute work still grows ~10×,
    // which is what the timing probe gates; the fraction itself is not
    // a realism claim at sf1).
    replicate("events", (df, k) => df
      .withColumn("event_id", col("event_id") + lit(k * 100000000L))
      .withColumn("user_id", col("user_id") + lit(k * 10000000L)))
    // orders: offset order keys — 10× orders over the same month span
    // (q67's months dimension stays fixed while the fact volume grows).
    replicate("orders", (df, k) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(k * 100000000L)))
    // supplier: dim table copied verbatim — suppkeys are NOT offset in
    // the replicated lineitem, so a constant supplier dim against 10×
    // facts is both correct and the realistic scale shape.
    for (dim <- Seq("supplier", "customer", "nation", "region")) {
      val out = s"$big/$dim.parquet"
      if (!new java.io.File(s"$out/_SUCCESS").exists())
        spark.read.parquet(s"$base/$dim.parquet")
          .write.mode("overwrite").parquet(out)
    }

    val all = Seq("d3_minhash_lsh", "d4_simhash", "d9_bloom_decontaminate",
      "g1_pagerank", "s6_ann_pq",
      // round-6 additions with nontrivial growth behavior
      "t10_top_ngrams", "d13_group_sample", "q45_topk_group",
      "d14_containment", "g16_modularity", "g17_clustering_coeff",
      "s9_knn_graph", "d18_simhash_clusters",
      // round-7 additions with nontrivial growth behavior
      "s11_binary_rerank", "d20_incremental_dedup",
      // s15: the within-cell pair join is the growth risk — with k fixed
      // at 4 while N grows 10×, cells hold 10× vectors → ~100× in-cell
      // pairs, the documented grow-k-with-N knob made measurable (the
      // s9 probe's analog; at real scale k scales with N).
      "s15_semdedup", "q61_hll_merge",
      // late round-7 additions: banded phash pairs (density-dependent),
      // broadcast-eval overlap scores, the Q21 semi/anti self-joins on
      // distinct pair frames, cell-profile aggregate, JSONL write+read
      "m6_phash_dedup", "d23_overlap_score", "q62_waiting_suppliers",
      "s16_cell_medoids", "t18_jsonl_ingest",
      // round-7 continuation: lift over the shared pair materialization,
      // percentile-derived rich-club cutoffs (dimension-sized ranking),
      // per-source word aggregates, day-dimension window, d6 rollup,
      // window-frame conditional aggregate
      "q63_assoc_rules", "g24_rich_club", "t19_vocab_growth",
      "q64_cumulative_users", "d24_dedup_yield", "m7_silence_trim",
      "t20_langid_margin", "q65_pareto_suppliers", "g25_component_sizes",
      "q66_event_transitions", "d25_snapshot_diff", "s17_coreset_sample",
      "q67_mom_growth", "s18_cell_separation", "q68_hopping_stats",
      "d26_split_leakage", "d27_cluster_sizes",
      "s19_ann_cost", "q69_column_corr", "q70_quality_audit",
      "q71_incremental_rollup", "d28_quality_canon", "g27_mis",
      "m8_modality_alignment", "g28_graph_diff", "q72_hierarchy_shares",
      "q73_revenue_movers", "q74_deletion_cascade")
    val probes = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(s => all.filter(s.split(",").toSet)).getOrElse(all)
    def run(dir: String, name: String): Double = {
      spark.sqlContext.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    neutralWarmup(spark, base)
    println(f"[gscale] ${"query"}%-24s ${"sf0.1"}%8s ${"sf1"}%8s  ratio")
    probes.foreach { name =>
      val tSmall = run(base, name)
      val tBig = run(big, name)
      println(f"[gscale] $name%-24s $tSmall%8.2f $tBig%8.2f  ${tBig / tSmall}%5.2f")
      if (name == "d18_simhash_clusters") {
        // Output-shaping evidence: the cluster collapse must stay O(docs)
        // even where the d4 pair list is quadratic-in-group-size.
        val rows = SparkEntry.queries(name)(spark, big).count()
        val docsN = spark.read.parquet(s"$big/documents.parquet").count()
        println(s"[gscale] d18_rows_vs_docs        $rows <= $docsN: ${rows <= docsN}")
      }
      if (name == "s9_knn_graph") {
        // The scale-knob evidence: candidate-pair volume of the
        // multi-probe bucket join must grow ~O(N), not quadratically.
        val cSmall = graft.operators.SimilarityQueries.knnCandidateCount(spark, base)
        val cBig = graft.operators.SimilarityQueries.knnCandidateCount(spark, big)
        println(f"[gscale] s9_candidate_pairs     $cSmall%8d $cBig%8d  ${cBig.toDouble / cSmall}%5.2f")
      }
      if (name == "d3_minhash_lsh") {
        // Convention evidence (r9): under the per-copy word bijection no
        // verified pair may straddle copies — pair volume must be the
        // per-copy organic density × copies, not quadratic in copies.
        val cross = graft.operators.DedupQueries.d3CrossCopyPairs(spark, big, 1000000L)
        println(s"[gscale] d3_cross_copy_pairs     $cross (must be 0)")
      }
      if (name == "d4_simhash") {
        // Health bar: ≈ the random chance floor for the configured
        // width — 30-bit/h≤2 measured 171 here (r9); the r10
        // 60-bit/h≤4 floor is ~1e-6 expected pairs at 50k docs, so the
        // bar is now 0 — see the sf10 twin's comment.
        val cross = graft.operators.DedupQueries.d4CrossCopyPairs(spark, big, 1000000L)
        println(s"[gscale] d4_cross_copy_pairs     $cross (must be ~0 at 60 bits; was 171 at 30)")
      }
    }
    // Locality-partitioner pricing (VERDICT r8 item 7): the `Gmr
    // partition … locality` verb's pipeline — self-contained LPA at the
    // verb's default 5 iterations (each two O(E) shuffles, the g8 cost
    // model; deliberately NOT the derive-once materialization, so both
    // sides bill the same cold build), capacity-split LPT assignment,
    // and the fmt=1111 subgraph write — over the co-purchase graph.
    // The shared part_pairs derivation may be warm from the probes
    // above on either side (the first-caller-pays convention).
    if (sys.env.get("SPARK_GRAFT_SCALE_ONLY")
        .forall(_.split(",").toSet.contains("locality"))) {
      def locality(dir: String): Double = {
        spark.sqlContext.clearCache()
        val t0 = System.nanoTime()
        val pairs = graft.operators.GraphQueries.partPairsMaterialized(spark, dir)
        val g = graft.graph.PropertyGraph(
          pairs.select(col("src").as("id"))
            .union(pairs.select(col("dst").as("id"))).distinct(),
          graft.graph.PropertyGraph.symmetrize(pairs))
        val assign = graft.io.GraphLoaders.localityAssignment(
          graft.graph.GraphOps.labelPropagation(g, 5)
            .select(col("id"), col("label")), 3)
        val out = s"${sys.props("user.dir")}/target/graft_scale/locality_probe/" +
          new java.io.File(dir).getName
        new java.io.File(out).getParentFile.mkdirs()
        graft.io.GraphLoaders.writeMetisSubgraphs(g, 3, out, Some(assign))
        (System.nanoTime() - t0) / 1e9
      }
      val tSmall = locality(base)
      val tBig = locality(big)
      println(f"[gscale] locality_partition     $tSmall%8.2f $tBig%8.2f  ${tBig / tSmall}%5.2f")
    }
    spark.stop()
  }
}
