package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in batch shape via
  * `mapPartitions` over a typed Dataset (the JVM analog of the
  * arrow-batched Python UDF pattern).
  *
  * The container ships no image/audio codecs, so [[FakeCodec.decode]] is a
  * clearly-marked deterministic STUB — the Spark-side plumbing (schema,
  * encoders, partition-batch iteration, feature schema) is real and
  * tested, and swapping the stub for a real codec changes nothing
  * structurally.
  *
  * At scale: payloads stay off the driver; feature extraction is
  * narrow (no shuffle); decode parallelism = partition count, so
  * repartition to cores × k before calling when payloads are few and fat.
  */
object Media {

  final case class MediaRecord(media_id: Long, kind: String,
                               payload: Array[Byte], n_bytes: Long)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 first_byte: Long, checksum: Long, feature: Double)

  /** STUB codec: a real implementation would decode the payload (JPEG →
    * pixels, PCM → samples, video → frame sample) here. This deterministic
    * fake derives "features" from the raw bytes so the full pipeline is
    * end-to-end testable without codecs. */
  object FakeCodec {
    val P = 1000000007L
    def decode(payload: Array[Byte]): (Long, Double) = {
      // ??? real codec goes here — deterministic byte-fold stands in
      var acc = 0L
      var i = 0
      while (i < payload.length) {
        acc = (acc * 31 + (payload(i) & 0xff)) % P
        i += 1
      }
      (acc, (acc % 1000).toDouble / 1000.0)
    }
  }

  /** Derive an opaque media table from any table with an id and a string
    * payload column (the testdata has no binary table; utf-8 bytes stand
    * in for a real payload — the pipeline is payload-agnostic). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String,
                    kind: String = "text/plain"): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
        encode(col(textCol), "UTF-8").as("payload"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  final case class FrameSample(media_id: Long, frame_idx: Long,
                               frame_bytes: Long, frame_checksum: Long)

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th — the video/audio pattern (decode only sampled
    * frames) with the stub codec standing in for the frame decode. Runs
    * as a flatMap inside mapPartitions: narrow, no shuffle, output rows
    * ≪ input bytes — the shape that matters when a frame decode is the
    * expensive step at 100 TB. */
  def sampleFrames(media: Dataset[MediaRecord],
                   frameSize: Int = 64, stride: Int = 4): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { r =>
        val nf = math.ceil(r.payload.length / frameSize.toDouble).toLong
        (0L until nf by stride.toLong).iterator.map { k =>
          val off = (k * frameSize).toInt
          val len = math.min(frameSize, r.payload.length - off)
          var acc = 0L
          var i = off
          while (i < off + len) { acc = (acc * 31 + (r.payload(i) & 0xff)) % FakeCodec.P; i += 1 }
          FrameSample(r.media_id, k, len.toLong, acc)
        }
      }
    }
  }

  final case class AudioWindow(media_id: Long, window_idx: Long,
                               n_samples: Long, energy: Long, peak: Long)

  /** Windowed audio analysis: treat the payload as 8-bit PCM samples
    * (the stub stand-in for a real audio decode) and emit per-window
    * integer energy (Σ sample²) and peak — the silence-trim /
    * loudness-gate primitives of an audio pipeline. Integer energy
    * instead of RMS keeps it exact (bounded: 256·255² ≪ 2⁶³) and
    * engine-portable; RMS is one sqrt away downstream. Same narrow
    * mapPartitions shape as [[sampleFrames]]: no shuffle, output rows ≪
    * payload bytes, decode parallelism = partition count. */
  def windowedEnergy(media: Dataset[MediaRecord],
                     window: Int = 256): Dataset[AudioWindow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { r =>
        val nw = math.ceil(r.payload.length / window.toDouble).toLong
        (0L until nw).iterator.map { k =>
          val off = (k * window).toInt
          val len = math.min(window, r.payload.length - off)
          var e = 0L
          var p = 0L
          var i = off
          while (i < off + len) {
            val s = (r.payload(i) & 0xff).toLong
            e += s * s
            if (s > p) p = s
            i += 1
          }
          AudioWindow(r.media_id, k, len.toLong, e, p)
        }
      }
    }
  }

  final case class ImagePatch(media_id: Long, patch_row: Long, patch_col: Long,
                              patch_h: Long, patch_w: Long, n_px: Long,
                              px_sum: Long, checksum: Long)

  /** Patch-grid extraction — the ViT preprocessing shape: treat the
    * payload as a `width`-wide 8-bit grayscale raster (the stub stand-in
    * for a real image decode; height = ceil(bytes/width), last raster
    * row may be short) and split it into `patch`×`patch` tiles, emitting
    * per-tile pixel count, integer pixel sum (mean = sum/n_px one
    * division downstream — kept exact here) and the row-major byte-fold
    * checksum. Edge tiles clip to the raster (the pad-vs-clip choice a
    * real pipeline makes explicit). Same narrow mapPartitions shape as
    * [[sampleFrames]]: no shuffle, output rows ≪ payload bytes, and a
    * real decoder slots into the tile loop without structural change. */
  def patchGrid(media: Dataset[MediaRecord],
                width: Int = 32, patch: Int = 16): Dataset[ImagePatch] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { r =>
        val n = r.payload.length.toLong
        val h = math.ceil(n / width.toDouble).toLong
        val pr = math.ceil(h / patch.toDouble).toLong
        val pc = math.ceil(width / patch.toDouble).toLong
        for {
          i <- (0L until pr).iterator
          j <- (0L until pc).iterator
        } yield {
          val ymax = math.min((i + 1) * patch, h)
          val xmax = math.min((j + 1) * patch, width.toLong)
          var sum = 0L; var acc = 0L; var npx = 0L
          var y = i * patch
          while (y < ymax) {
            var x = j * patch
            while (x < xmax) {
              val idx = y * width + x
              if (idx < n) {
                val b = (r.payload(idx.toInt) & 0xff).toLong
                sum += b; acc = (acc * 31 + b) % FakeCodec.P; npx += 1
              }
              x += 1
            }
            y += 1
          }
          ImagePatch(r.media_id, i, j, ymax - i * patch, xmax - j * patch,
            npx, sum, acc)
        }
      }
    }
  }

  /** Batch feature extraction: one decode call per record, iterated per
    * partition (the batch shape a vectorized codec wants). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        val (checksum, feature) = FakeCodec.decode(r.payload)
        val first = if (r.payload.nonEmpty) (r.payload(0) & 0xff).toLong else -1L
        MediaFeatures(r.media_id, r.kind, r.n_bytes, first, checksum, feature)
      }
    }
  }

  final case class MediaHash(media_id: Long, phash: Long)

  /** Perceptual-hash stub: split the payload into `windows` equal byte
    * windows (w = ceil(n/windows); trailing windows may be empty — their
    * bit is 0) and set bit j to the parity of window j's byte-fold
    * checksum. A real image pipeline puts pHash/aHash (DCT or mean
    * threshold over a downscaled raster) here — the property that
    * matters downstream is the same: locally-perturbed payloads flip few
    * bits, so near-dups sit at small hamming distance. Same narrow
    * mapPartitions shape as [[sampleFrames]]: no shuffle, 8 bytes out
    * per payload in. */
  def perceptualHash(media: Dataset[MediaRecord],
                     windows: Int = 60): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        val n = r.payload.length
        val w = (n + windows - 1) / windows
        var h = 0L
        var j = 0
        while (j < windows) {
          val off = j * w
          val end = math.min(off + w, n)
          var acc = 0L
          var i = off
          while (i < end) { acc = (acc * 31 + (r.payload(i) & 0xff)) % FakeCodec.P; i += 1 }
          h |= (acc & 1L) << j
          j += 1
        }
        MediaHash(r.media_id, h)
      }
    }
  }
}
