package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.Media

/** Multimodal-column query surface: the documents table's text re-encoded
  * as opaque binary payloads and pushed through the typed
  * mapPartitions feature-extraction pipeline (stub codec — see
  * [[graft.multimodal.Media.FakeCodec]]).
  *
  * The oracle reproduces the byte-fold checksum with the char-fold SQL
  * (identical for ASCII payloads — the testdata is ASCII; a real binary
  * table would get a rows-only check instead). */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  def m1MediaFeatures(s: SparkSession, d: String): DataFrame = {
    val media = Media.mediaFromText(Tables.documents(s, d), "doc_id", "text")
    Media.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("first_byte"), col("checksum"), round(col("feature"), 6).as("feature"))
      .orderBy("media_id")
  }

  /** m2: frame sampling over the binary payloads — every 4th 64-byte
    * frame with its per-frame checksum ([[graft.multimodal.Media.sampleFrames]];
    * the oracle reproduces the frame arithmetic with substring + the
    * char-fold, exact for ASCII payloads). */
  def m2FrameSample(s: SparkSession, d: String): DataFrame = {
    val media = Media.mediaFromText(Tables.documents(s, d), "doc_id", "text")
    Media.sampleFrames(media).toDF().orderBy("media_id", "frame_idx")
  }

  /** m3: windowed audio energy/peak over the payloads-as-8-bit-PCM stub
    * ([[graft.multimodal.Media.windowedEnergy]]) — integer Σ sample² and
    * max per 256-sample window; the oracle replays the window arithmetic
    * with substring + ascii folds. */
  def m3AudioEnergy(s: SparkSession, d: String): DataFrame = {
    val media = Media.mediaFromText(Tables.documents(s, d), "doc_id", "text",
      kind = "audio/pcm8")
    Media.windowedEnergy(media).toDF().orderBy("media_id", "window_idx")
  }

  /** m4: ViT-style patch-grid extraction over the payloads-as-raster
    * stub ([[graft.multimodal.Media.patchGrid]]) — 16×16 tiles of a
    * 32-wide 8-bit image, per-tile pixel count / integer sum /
    * row-major checksum; the oracle replays the tile geometry with
    * flattened index lists + ascii folds (ASCII contract as m3). */
  def m4PatchGrid(s: SparkSession, d: String): DataFrame = {
    val media = Media.mediaFromText(Tables.documents(s, d), "doc_id", "text",
      kind = "image/gray8")
    Media.patchGrid(media).toDF().orderBy("media_id", "patch_row", "patch_col")
  }

  /** m5: scene-cut detection over the m2 frame samples — the keyframe-
    * extraction step of a video pipeline (decode sampled frames, diff
    * consecutive frame features, keep the big jumps): per media, the
    * per-frame stub feature (checksum % 1000 — a real pipeline puts a
    * perceptual hash here) is diffed against the previous sampled frame
    * with one lag window ORDERED BY frame index; a cut is a first frame
    * or a jump ≥ [[SceneCutThreshold]]. The window partitions by media —
    * frames-per-media is bounded, never corpus-wide. */
  def m5SceneCuts(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val media = Media.mediaFromText(Tables.documents(s, d), "doc_id", "text",
      kind = "video/frames")
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    Media.sampleFrames(media).toDF()
      .withColumn("feat", col("frame_checksum") % 1000)
      .withColumn("delta", abs(col("feat") - lag(col("feat"), 1).over(w)))
      .select(col("media_id"), col("frame_idx"), col("feat"), col("delta"),
        (col("delta").isNull || col("delta") >= SceneCutThreshold).as("is_cut"))
      .orderBy("media_id", "frame_idx")
  }

  private val SceneCutThreshold = 250L

  /** m6: perceptual-hash media dedup — the image-dedup pipeline (pHash +
    * small-hamming pairing) over the binary payloads: the 60-bit stub
    * perceptual hash per payload ([[graft.multimodal.Media.perceptualHash]];
    * a real pipeline computes DCT-pHash in the same mapPartitions slot),
    * then candidate pairs via the d4 banding kernel — 4 bands × 15 bits,
    * pigeonhole-complete for hamming ≤ 3 — and the exact popcount
    * verify. Near-identical payloads (small localized edits) flip few
    * window parities, so they meet at small hamming; the join is
    * equi-key on band slices, never all-pairs, and each payload has
    * been reduced to 8 bytes before anything shuffles. */
  def m6PhashDedup(s: SparkSession, d: String): DataFrame = {
    val media = Media.mediaFromText(Tables.documents(s, d), "doc_id", "text",
      kind = "image/gray8")
    val fps = Media.perceptualHash(media, windows = PhBits).toDF()
      .select(col("media_id").as("id"), col("phash").as("simhash"))
    graft.dedup.SimHash.bandedPairs(fps, bands = PhBands,
        maxHamming = PhMaxHamming, bits = PhBits)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  private val PhBits = 60
  private val PhBands = 4
  private val PhMaxHamming = 3 // ≤ bands-1: banding is pigeonhole-complete

  /** m7: silence trimming over the m3 audio windows — the
    * loudness-gate/trim primitive those windows exist for (drop leading/
    * trailing low-energy audio before feature extraction): a window is
    * silent when its mean squared sample falls below
    * [[SilenceMeanSq]] (`energy < T·n_samples`, exact integers), and the
    * per-media trim is min/max active window index + active count — one
    * map-combinable conditional aggregate over the window frame, grouped
    * by media (bounded per-media windows, no corpus-wide window
    * function). All-silent media report -1/-1 and keep nothing. A real
    * decoder changes only the window kernel, not this shape. */
  def m7SilenceTrim(s: SparkSession, d: String): DataFrame = {
    val media = Media.mediaFromText(Tables.documents(s, d), "doc_id", "text",
      kind = "audio/pcm8")
    val act = col("energy") >= lit(SilenceMeanSq) * col("n_samples")
    Media.windowedEnergy(media).toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(act, 1L).otherwise(0L)).as("n_active"),
        coalesce(min(when(act, col("window_idx"))), lit(-1L)).as("first_active"),
        coalesce(max(when(act, col("window_idx"))), lit(-1L)).as("last_active"))
      .orderBy("media_id")
  }

  private val SilenceMeanSq = 9700L

  /** m8: cross-modal alignment audit — q70's referential check applied
    * ACROSS modalities: every multimodal pipeline assumes each document
    * has its embedding and vice versa, and silently broken alignment
    * (a failed embedding job, a partial re-crawl) poisons every
    * downstream join. Per source: doc count, docs with a vector,
    * docs missing one; plus one `__orphan_vectors__` row for vectors
    * with no document. Ids align doc_id ↔ vec_id in this corpus (the
    * s-family relies on it — this gate makes the assumption checkable).
    *
    * Scale shape: one left-semi-style membership join on the id (both
    * sides reduced to key columns first) + one anti-join for orphans;
    * rollup over the source dimension. */
  def m8ModalityAlignment(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d).select(col("vec_id"))
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val matched = docs
      .join(vecs.select(col("vec_id").as("doc_id")).withColumn("hasv", lit(1L)),
        Seq("doc_id"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hasv"), lit(0L))).as("n_with_vec"))
      .select(col("source"), col("n_docs"), col("n_with_vec"),
        (col("n_docs") - col("n_with_vec")).as("n_missing_vec"))
    val orphans = vecs
      .join(docs.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("__orphan_vectors__").as("source"), lit(0L).as("n_docs"),
        lit(0L).as("n_with_vec"), col("n").as("n_missing_vec"))
    matched.unionAll(orphans).orderBy("source")
  }

  val queries: Map[String, Q] = Map(
    "m8_modality_alignment" -> m8ModalityAlignment,
    "m1_media_features" -> m1MediaFeatures,
    "m2_frame_sample" -> m2FrameSample,
    "m3_audio_energy" -> m3AudioEnergy,
    "m4_patch_grid" -> m4PatchGrid,
    "m5_scene_cuts" -> m5SceneCuts,
    "m6_phash_dedup" -> m6PhashDedup,
    "m7_silence_trim" -> m7SilenceTrim)

  private def sqlCharHash(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, b) -> (a*31 + b) % ${Media.FakeCodec.P})""".stripMargin

  val oracle: Map[String, String] = Map(
    "m8_modality_alignment" ->
      """WITH m AS (SELECT d.source, count(*) AS n_docs,
        |    CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_with_vec
        |  FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
        |  GROUP BY d.source),
        |o AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings e
        |  WHERE NOT EXISTS (SELECT 1 FROM documents d
        |    WHERE d.doc_id = e.vec_id))
        |SELECT source, n_docs, n_with_vec,
        |  n_docs - n_with_vec AS n_missing_vec FROM m
        |UNION ALL
        |SELECT '__orphan_vectors__', CAST(0 AS BIGINT), CAST(0 AS BIGINT), n
        |FROM o
        |ORDER BY source""".stripMargin,
    "m6_phash_dedup" ->
      s"""WITH d0 AS (SELECT doc_id AS id, text,
         |    octet_length(encode(text)) AS n FROM documents),
         |wz AS (SELECT id, text, (n + ${PhBits - 1}) // $PhBits AS w FROM d0),
         |seg AS (SELECT id, range AS j,
         |    substring(text, CAST(range*w + 1 AS INT), CAST(w AS INT)) AS sg
         |  FROM wz, range(0, $PhBits)),
         |fp AS MATERIALIZED (SELECT id,
         |    CAST(sum((${sqlCharHash("sg")} % 2) << j) AS BIGINT) AS ph
         |  FROM seg GROUP BY id)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.id < b.id
         |WHERE bit_count(xor(a.ph, b.ph)) <= $PhMaxHamming
         |ORDER BY id_a, id_b""".stripMargin,
    "m1_media_features" ->
      s"""SELECT doc_id AS media_id, 'text/plain' AS kind,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
         |  ${sqlCharHash("text")} AS checksum,
         |  round((${sqlCharHash("text")} % 1000) / 1000.0, 6) AS feature
         |FROM documents ORDER BY media_id""".stripMargin,
    "m2_frame_sample" ->
      s"""WITH b AS (SELECT doc_id, text,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb FROM documents),
         |k AS (SELECT doc_id, text, nb,
         |    unnest(list_transform(
         |      range(0, CAST(ceil(nb / 64.0) AS BIGINT), 4),
         |      x -> CAST(x AS BIGINT))) AS fi FROM b)
         |SELECT doc_id AS media_id, fi AS frame_idx,
         |  least(nb - fi * 64, 64) AS frame_bytes,
         |  ${sqlCharHash("substring(text, CAST(fi * 64 + 1 AS BIGINT), 64)")}
         |    AS frame_checksum
         |FROM k ORDER BY media_id, frame_idx""".stripMargin,
    // ASCII contract: n_samples/window offsets count BYTES
    // (octet_length) while the energy/peak folds walk CHARACTERS
    // (string_split + ascii) — the two agree, and both match the
    // Spark side's byte-wise PCM walk, only while every text is
    // single-byte ASCII. MediaSpec pins that corpus property
    // (octet_length == length for every sf0.01 document); a non-ASCII
    // corpus would need the folds rewritten over encode(text) bytes.
    "m4_patch_grid" ->
      s"""WITH b AS (SELECT doc_id, text,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb FROM documents),
         |g AS (SELECT doc_id, text, nb,
         |    CAST(ceil(nb / 32.0) AS BIGINT) AS h FROM b),
         |ij AS (SELECT doc_id, text, nb, h,
         |    unnest(range(0, CAST(ceil(h / 16.0) AS BIGINT))) AS i FROM g),
         |p AS (SELECT doc_id, text, nb, h, i,
         |    unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS j FROM ij),
         |t AS (SELECT doc_id, i, j,
         |    least((i+1)*16, h) - i*16 AS patch_h,
         |    CAST(16 AS BIGINT) AS patch_w,
         |    list_transform(
         |      list_filter(
         |        flatten(list_transform(range(i*16, least((i+1)*16, h)),
         |          y -> list_transform(range(j*16, (j+1)*16), x -> y*32 + x))),
         |        ii -> ii < nb),
         |      ii -> CAST(ascii(substring(text, CAST(ii + 1 AS BIGINT), 1))
         |        AS BIGINT)) AS vals
         |  FROM p)
         |SELECT doc_id AS media_id, i AS patch_row, j AS patch_col,
         |  patch_h, patch_w,
         |  CAST(len(vals) AS BIGINT) AS n_px,
         |  CAST(coalesce(list_sum(vals), 0) AS BIGINT) AS px_sum,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), vals),
         |    (a, c) -> (a*31 + c) % ${Media.FakeCodec.P}) AS checksum
         |FROM t ORDER BY media_id, patch_row, patch_col""".stripMargin,
    "m5_scene_cuts" ->
      s"""WITH b AS (SELECT doc_id, text,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb FROM documents),
         |k AS (SELECT doc_id, text, nb,
         |    unnest(list_transform(
         |      range(0, CAST(ceil(nb / 64.0) AS BIGINT), 4),
         |      x -> CAST(x AS BIGINT))) AS fi FROM b),
         |f AS (SELECT doc_id AS media_id, fi AS frame_idx,
         |    ${sqlCharHash("substring(text, CAST(fi * 64 + 1 AS BIGINT), 64)")}
         |      % 1000 AS feat
         |  FROM k),
         |dl AS (SELECT media_id, frame_idx, feat,
         |    abs(feat - lag(feat, 1) OVER (PARTITION BY media_id
         |      ORDER BY frame_idx)) AS delta
         |  FROM f)
         |SELECT media_id, frame_idx, feat, delta,
         |  delta IS NULL OR delta >= 250 AS is_cut
         |FROM dl ORDER BY media_id, frame_idx""".stripMargin,
    "m7_silence_trim" ->
      s"""WITH b AS (SELECT doc_id, text,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb FROM documents),
         |k AS (SELECT doc_id, text, nb,
         |    unnest(list_transform(
         |      range(0, CAST(ceil(nb / 256.0) AS BIGINT)),
         |      x -> CAST(x AS BIGINT))) AS wi FROM b),
         |w AS (SELECT doc_id, wi, nb,
         |    substring(text, CAST(wi * 256 + 1 AS BIGINT), 256) AS sub FROM k),
         |e AS (SELECT doc_id, wi, least(nb - wi * 256, 256) AS ns,
         |    CAST(list_sum(list_transform(string_split(sub, ''),
         |      c -> CAST(ascii(c) AS BIGINT) * CAST(ascii(c) AS BIGINT)))
         |      AS BIGINT) AS energy
         |  FROM w)
         |SELECT doc_id AS media_id, count(*) AS n_windows,
         |  CAST(sum(CASE WHEN energy >= $SilenceMeanSq * ns THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_active,
         |  CAST(coalesce(min(CASE WHEN energy >= $SilenceMeanSq * ns THEN wi END), -1)
         |    AS BIGINT) AS first_active,
         |  CAST(coalesce(max(CASE WHEN energy >= $SilenceMeanSq * ns THEN wi END), -1)
         |    AS BIGINT) AS last_active
         |FROM e GROUP BY doc_id ORDER BY media_id""".stripMargin,
    "m3_audio_energy" ->
      s"""WITH b AS (SELECT doc_id, text,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb FROM documents),
         |k AS (SELECT doc_id, text, nb,
         |    unnest(list_transform(
         |      range(0, CAST(ceil(nb / 256.0) AS BIGINT)),
         |      x -> CAST(x AS BIGINT))) AS wi FROM b),
         |w AS (SELECT doc_id, wi, nb,
         |    substring(text, CAST(wi * 256 + 1 AS BIGINT), 256) AS sub FROM k)
         |SELECT doc_id AS media_id, wi AS window_idx,
         |  least(nb - wi * 256, 256) AS n_samples,
         |  CAST(list_sum(list_transform(string_split(sub, ''),
         |    c -> CAST(ascii(c) AS BIGINT) * CAST(ascii(c) AS BIGINT))) AS BIGINT)
         |    AS energy,
         |  CAST(list_max(list_transform(string_split(sub, ''),
         |    c -> CAST(ascii(c) AS BIGINT))) AS BIGINT) AS peak
         |FROM w ORDER BY media_id, window_idx""".stripMargin)
}
