package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A media row: opaque binary payload + typed metadata — the multimodal
  * column pattern (image/audio/video as `binary`, metadata alongside). */
final case class MediaRow(doc_id: Long, bytes: Array[Byte], mime: String)

/** Decoded media features. In production `features` comes from a real
  * codec/model; the schema and batch shape are what the pipeline contracts
  * on. */
final case class MediaFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    features: Array[Float])

/** Average-pooled resize output: row-major `out_w`×`out_h` cells. */
final case class ResizedMedia(
    doc_id: Long,
    out_w: Int,
    out_h: Int,
    pixels: Array[Float])

/** A really-decoded image: dimensions, band count, and row-major grayscale
  * pixels (raw sample values for 1-band images; ITU-R 601 luma of the RGB
  * for multi-band). */
final case class DecodedImage(
    doc_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    pixels: Array[Float])

/** A really-decoded audio payload: format metadata + channel-0 samples
  * normalized to [-1, 1]. */
final case class DecodedAudio(
    doc_id: Long,
    sample_rate: Int,
    channels: Int,
    bits: Int,
    samples: Array[Float])

/** Multimodal-column plumbing: binary columns with typed metadata, decode
  * as `mapPartitions` (one codec init per partition, iterator-to-iterator
  * streaming, no driver involvement), typed output schema.
  *
  * [[decodeImages]]/[[resizeImages]] and [[decodeWavs]] are the REAL codec
  * paths — PNG/JPEG/BMP/GIF via `javax.imageio` and WAV/PCM via
  * `javax.sound.sampled` (both JDK-built-in, work headless). The
  * byte-histogram [[decodeFeatures]] and square-ish [[resizePooled]] stay
  * as the deterministic no-codec test doubles for payloads that are not
  * media at all. */
object MultimodalOps {

  /** Project a text table into the media shape: payload as `binary` +
    * mime metadata. With real data this is the parquet/`binaryFile` read. */
  def asMedia(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      col(textCol).cast("binary").as("bytes"),
      lit("application/octet-stream").as("mime"))

  /** REAL image decode: PNG/JPEG/BMP/GIF through `javax.imageio` inside
    * the per-partition harness. Undecodable payloads (truncated files,
    * non-image bytes, unknown formats) are dropped — quarantine them by
    * anti-joining the output's `doc_id` back against the input. Grayscale
    * extraction: 1-band rasters read their raw samples exactly (a gray PNG
    * round-trips bit-perfectly); multi-band images take the ITU-R 601 luma
    * of the sRGB pixel. */
  def decodeImages(media: DataFrame): Dataset[DecodedImage] = {
    val typed = media.as(Encoders.product[MediaRow])
    typed.mapPartitions { rows =>
      // Per-partition codec init: disable ImageIO's disk-backed stream
      // cache (executor tmp churn; payloads are already in memory).
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        try {
          if (m.bytes == null) throw new java.io.IOException("null payload")
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.bytes))
          if (img == null) None
          else {
            val w = img.getWidth
            val h = img.getHeight
            val raster = img.getRaster
            val bands = raster.getNumBands
            val px = new Array[Float](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(y * w + x) =
                  if (bands == 1) raster.getSampleFloat(x, y, 0)
                  else {
                    val rgb = img.getRGB(x, y)
                    0.299f * ((rgb >> 16) & 0xff) +
                      0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)
                  }
                x += 1
              }
              y += 1
            }
            Some(DecodedImage(m.doc_id, w, h, bands, px))
          }
        } catch {
          // javax.imageio throws RuntimeExceptions (CMMException, index
          // errors) on malformed files, not just IOException — a single
          // corrupt payload must drop its row, never the job.
          case scala.util.control.NonFatal(_) => None
        }
      }
    }(Encoders.product[DecodedImage])
  }

  /** REAL audio decode: WAV/PCM through `javax.sound.sampled` in the same
    * per-partition harness. Supports the PCM cases WAV actually carries
    * (8-bit unsigned, 16-bit signed, either endianness); compressed or
    * exotic encodings — like undecodable bytes — are dropped, quarantine
    * by anti-joining `doc_id`. Channel 0's samples come back normalized
    * to [-1, 1]; a 16-bit round-trip is bit-exact. One row per payload —
    * chunk long recordings upstream ([[sampleFrames]] is the slicing
    * shape) so a row's samples stay executor-memory-bounded. */
  def decodeWavs(media: DataFrame): Dataset[DecodedAudio] = {
    val typed = media.as(Encoders.product[MediaRow])
    typed.mapPartitions { rows =>
      rows.flatMap { m =>
        try {
          if (m.bytes == null) throw new java.io.IOException("null payload")
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.bytes))
          val f = in.getFormat
          val enc = f.getEncoding
          val ok = (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              f.getSampleSizeInBits == 16) ||
            (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED &&
              f.getSampleSizeInBits == 8)
          if (!ok) None
          else {
            val bytes = in.readAllBytes()
            val ch = f.getChannels
            val bps = f.getSampleSizeInBits / 8
            val frameBytes = bps * ch
            val n = bytes.length / frameBytes
            val out = new Array[Float](n)
            var i = 0
            while (i < n) {
              val o = i * frameBytes // channel 0 = first sample in frame
              out(i) =
                if (bps == 1) ((bytes(o) & 0xff) - 128) / 128f
                else {
                  val (lo, hi) = if (f.isBigEndian) (o + 1, o) else (o, o + 1)
                  ((bytes(hi) << 8) | (bytes(lo) & 0xff)).toShort / 32768f
                }
              i += 1
            }
            Some(DecodedAudio(m.doc_id, f.getSampleRate.toInt, ch,
              f.getSampleSizeInBits, out))
          }
        } catch {
          // Same contract as decodeImages: any per-payload decode failure
          // (unsupported container, truncation, runtime parser errors)
          // drops the row, never the job.
          case scala.util.control.NonFatal(_) => None
        }
      }
    }(Encoders.product[DecodedAudio])
  }

  /** Average-pool a decoded image's REAL pixel grid into `outW`×`outH` —
    * the production resize, fed by [[decodeImages]]. Same output-driven box
    * sampling as [[resizePooled]] (each output cell averages its ≥1-pixel
    * source block: downscale average-pools, upscale nearest-neighbors). */
  def resizeImages(decoded: Dataset[DecodedImage], outW: Int,
      outH: Int): Dataset[ResizedMedia] = {
    require(outW > 0 && outH > 0)
    decoded.mapPartitions { imgs =>
      imgs.map(d => ResizedMedia(d.doc_id, outW, outH,
        poolAvg(d.pixels, d.width, d.height, outW, outH)))
    }(Encoders.product[ResizedMedia])
  }

  /** Output-driven box-sampled average pooling over a row-major `w`×`h`
    * float grid. */
  private def poolAvg(src: Array[Float], w: Int, h: Int, outW: Int,
      outH: Int): Array[Float] = {
    val out = new Array[Float](outW * outH)
    if (src.isEmpty) return out
    var oy = 0
    while (oy < outH) {
      val y0 = oy * h / outH
      val y1 = math.max(y0 + 1, (oy + 1) * h / outH)
      var ox = 0
      while (ox < outW) {
        val x0 = ox * w / outW
        val x1 = math.max(x0 + 1, (ox + 1) * w / outW)
        var sum = 0.0; var cnt = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += src(y * w + x); cnt += 1; x += 1 }
          y += 1
        }
        out(oy * outW + ox) = (sum / cnt).toFloat
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** STUB decode, deterministic: dimensions derived from payload length,
    * features = normalized 16-bin byte histogram. Replace the body with the
    * codec call in production — the `mapPartitions` harness (per-partition
    * init, iterator-to-iterator streaming) is the part that matters. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val typed = media.as(Encoders.product[MediaRow])
    typed.mapPartitions { rows =>
      // Production: val codec = Codec.open() — once per partition.
      rows.map { m =>
        val n = m.bytes.length
        val hist = new Array[Float](16)
        var i = 0
        while (i < n) { hist((m.bytes(i) & 0xff) >> 4) += 1f; i += 1 }
        if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n; j += 1 } }
        MediaFeatures(m.doc_id, 16 + n % 64, 16 + n % 48, 3, hist)
      }
    }(Encoders.product[MediaFeatures])
  }

  /** Resize via average pooling: the payload is treated as a square-ish
    * 1-channel image (w = ⌈√n⌉) and pooled into an `outW`×`outH` grid —
    * this IS the pooling math of a real image resize, applied to the raw
    * bytes (no codec required), in the same per-partition harness as
    * [[decodeFeatures]]. Output is row-major, one float per cell. */
  def resizePooled(media: DataFrame, outW: Int, outH: Int): Dataset[ResizedMedia] = {
    require(outW > 0 && outH > 0)
    media.as(Encoders.product[MediaRow]).mapPartitions { rows =>
      rows.map { m =>
        val n = m.bytes.length
        val w = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
        val h = math.max(1, math.ceil(n.toDouble / w).toInt)
        val out = new Array[Float](outW * outH)
        // Output-driven box sampling: every output cell averages its
        // (≥1-pixel) source block, so upscales nearest-neighbor instead of
        // leaving zero-striped cells, and downscales average-pool.
        if (n > 0) {
          var oy = 0
          while (oy < outH) {
            val y0 = oy * h / outH
            val y1 = math.max(y0 + 1, (oy + 1) * h / outH)
            var ox = 0
            while (ox < outW) {
              val x0 = ox * w / outW
              val x1 = math.max(x0 + 1, (ox + 1) * w / outW)
              var sum = 0L; var cnt = 0
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  // clamp into the (possibly partial) last row
                  val i = math.min(y * w + x, n - 1)
                  sum += (m.bytes(i) & 0xff); cnt += 1
                  x += 1
                }
                y += 1
              }
              out(oy * outW + ox) = sum.toFloat / cnt
              ox += 1
            }
            oy += 1
          }
        }
        ResizedMedia(m.doc_id, outW, outH, out)
      }
    }(Encoders.product[ResizedMedia])
  }

  /** Frame-sampling shape: pick every `stride`-th byte as a stand-in for
    * every n-th video frame — the real operator slices the payload the same
    * way. Pure SQL expression, codegen'd. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.select(
      col("doc_id"),
      octet_length(col("bytes")).as("n_bytes"),
      // Generate only the sampled offsets (1, 1+stride, …) instead of
      // enumerating every byte and filtering — stride× fewer interpreted
      // lambda iterations, and stride=1 correctly yields every byte.
      expr(s"IF(octet_length(bytes) = 0, CAST(array() AS array<binary>), " +
        s"transform(sequence(1, octet_length(bytes), $stride), " +
        "i -> substring(bytes, i, 1)))")
        .as("frames"))
  }

  /** Perceptual difference hash (dHash, Krawetz 2013) over a media
    * payload: box-resample the byte grid to 9×8 through [[resizePooled]]
    * (the pooled-average path — resize-invariant by construction), then
    * one bit per horizontal neighbor pair (left < right). Near-duplicate
    * IMAGES then ride the same banded Hamming engine as text SimHash
    * ([[DedupOps.fingerprintPairs]]) — per-payload work is constant,
    * pairs appear only inside hash buckets. Output: (id, fp). */
  def dHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    resizePooled(media, 9, 8).map { r =>
      var h = 0L
      var bit = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (r.pixels(y * 9 + x) < r.pixels(y * 9 + x + 1))
            h |= (1L << bit)
          bit += 1
          x += 1
        }
        y += 1
      }
      (r.doc_id, h)
    }.toDF("id", "fp")
  }
}
