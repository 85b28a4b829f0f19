package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Multimodal plumbing: binary payload schema, mapPartitions decode stub,
  * frame sampling — the Spark-side shape is real even though the codec is a
  * deterministic fake (no image/audio libs in this container). */
class MultimodalOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def docs = Seq((1L, "abcd"), (2L, "xyz")).toDF("doc_id", "text")

  test("asMedia: binary payload + mime metadata schema") {
    val m = MultimodalOps.asMedia(docs)
    assert(m.schema.fieldNames.toSeq == Seq("doc_id", "bytes", "mime"))
    assert(m.schema("bytes").dataType.typeName == "binary")
    val r = m.orderBy("doc_id").head()
    assert(new String(r.getAs[Array[Byte]]("bytes"), "UTF-8") == "abcd")
  }

  test("decodeFeatures: typed output, deterministic stub values") {
    val out = MultimodalOps.decodeFeatures(MultimodalOps.asMedia(docs))
      .collect().sortBy(_.doc_id)
    assert(out.length == 2)
    val f = out(0)
    assert(f.width == 16 + 4 % 64 && f.height == 16 + 4 % 48 && f.channels == 3)
    assert(f.features.length == 16)
    assert(math.abs(f.features.sum - 1.0f) < 1e-6) // normalized histogram
    // Determinism across runs:
    val again = MultimodalOps.decodeFeatures(MultimodalOps.asMedia(docs))
      .collect().sortBy(_.doc_id)
    assert(again(0).features.toSeq == f.features.toSeq)
  }

  test("resizePooled: hand-computed box sampling to a 2x2 grid") {
    // 9 bytes -> 3x3 "image" [[1,2,3],[4,5,6],[7,8,9]]; output-driven
    // boxes: out row 0 covers src row [0,1), out row 1 covers rows [1,3)
    // (same split for columns).
    val bytes = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val m = Seq((1L, bytes, "raw")).toDF("doc_id", "bytes", "mime")
    val r = MultimodalOps.resizePooled(m, 2, 2).head()
    assert(r.out_w == 2 && r.out_h == 2 && r.pixels.length == 4)
    assert(r.pixels(0) == 1.0f)                   // src (0,0)
    assert(r.pixels(1) == (2 + 3) / 2.0f)         // src row 0, cols 1-2
    assert(r.pixels(2) == (4 + 7) / 2.0f)         // src rows 1-2, col 0
    assert(r.pixels(3) == (5 + 6 + 8 + 9) / 4.0f) // bottom-right 2x2 block
  }

  test("resizePooled: upscaling leaves no zero cells (nearest-neighbor)") {
    // 4 bytes -> 2x2 image; upscale to 4x4: every cell must hold a real
    // source value, not a zero stripe.
    val m = Seq((1L, Array[Byte](10, 20, 30, 40), "raw"))
      .toDF("doc_id", "bytes", "mime")
    val r = MultimodalOps.resizePooled(m, 4, 4).head()
    assert(r.pixels.length == 16)
    assert(r.pixels.forall(v => Set(10f, 20f, 30f, 40f).contains(v)))
    assert(r.pixels(0) == 10f && r.pixels(15) == 40f)
  }

  test("resizePooled: empty payload yields zero grid, no failure") {
    val m = Seq((1L, Array.empty[Byte], "raw")).toDF("doc_id", "bytes", "mime")
    val r = MultimodalOps.resizePooled(m, 3, 2).head()
    assert(r.pixels.toSeq == Seq.fill(6)(0.0f))
  }

  test("sampleFrames: every stride-th byte") {
    val out = MultimodalOps.sampleFrames(MultimodalOps.asMedia(docs), 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_bytes") == 4)
    val frames = out(0).getSeq[Array[Byte]](2)
    assert(frames.map(b => new String(b, "UTF-8")).mkString == "ac")
  }

  /** Encode a row-major grayscale grid as real PNG bytes. */
  private def grayPng(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages: a real generated PNG round-trips its exact pixels") {
    val px = Array(10, 20, 30, 40, 50, 60, 70, 80, 90) // 3x3
    val m = Seq((1L, grayPng(3, 3, px), "image/png"))
      .toDF("doc_id", "bytes", "mime")
    val d = MultimodalOps.decodeImages(m).head()
    assert(d.width == 3 && d.height == 3 && d.channels == 1)
    assert(d.pixels.toSeq == px.map(_.toFloat).toSeq)
  }

  test("decodeImages: RGB JPEG decodes with correct dims; luma in range") {
    val img = new java.awt.image.BufferedImage(
      8, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 8)
      img.setRGB(x, y, (x * 30 << 16) | (y * 40 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val m = Seq((7L, bos.toByteArray, "image/jpeg"))
      .toDF("doc_id", "bytes", "mime")
    val d = MultimodalOps.decodeImages(m).head()
    assert(d.doc_id == 7L && d.width == 8 && d.height == 5 && d.channels == 3)
    assert(d.pixels.length == 40 && d.pixels.forall(v => v >= 0f && v <= 255f))
  }

  test("decodeImages: undecodable and NULL payloads are dropped, not failed") {
    val m = Seq(
      (1L, grayPng(2, 2, Array(1, 2, 3, 4)), "image/png"),
      (2L, "this is not an image".getBytes("UTF-8"), "text/plain"),
      (3L, Array.empty[Byte], "application/octet-stream"),
      (4L, null.asInstanceOf[Array[Byte]], "image/png"))
      .toDF("doc_id", "bytes", "mime")
    val ids = MultimodalOps.decodeImages(m).collect().map(_.doc_id).toSeq
    assert(ids == Seq(1L))
    assert(MultimodalOps.decodeWavs(m).collect().isEmpty) // none is audio
  }

  test("resizeImages: hand-computed average pooling of a real PNG") {
    // 4x4 grid 0,10,…,150 → 2x2 pooling: each output cell averages its
    // 2x2 source block.
    val px = Array.tabulate(16)(_ * 10)
    val m = Seq((1L, grayPng(4, 4, px), "image/png"))
      .toDF("doc_id", "bytes", "mime")
    val r = MultimodalOps.resizeImages(MultimodalOps.decodeImages(m), 2, 2).head()
    assert(r.pixels.toSeq == Seq(
      (0 + 10 + 40 + 50) / 4f, (20 + 30 + 60 + 70) / 4f,
      (80 + 90 + 120 + 130) / 4f, (100 + 110 + 140 + 150) / 4f))
  }

  /** Encode 16-bit signed mono PCM samples as real WAV bytes. */
  private def wav16(rate: Float, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeWavs: a generated 16-bit WAV round-trips samples bit-exactly") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 100)
    val m = Seq((5L, wav16(8000f, samples), "audio/wav"))
      .toDF("doc_id", "bytes", "mime")
    val d = MultimodalOps.decodeWavs(m).head()
    assert(d.doc_id == 5L && d.sample_rate == 8000 && d.channels == 1
      && d.bits == 16)
    assert(d.samples.toSeq == samples.map(_ / 32768f).toSeq)
  }

  test("decodeWavs: non-audio payloads are dropped, not failed") {
    val m = Seq(
      (1L, wav16(16000f, Array[Short](1, 2, 3)), "audio/wav"),
      (2L, "definitely not a riff container".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "bytes", "mime")
    val out = MultimodalOps.decodeWavs(m).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
    assert(out.head.sample_rate == 16000 && out.head.samples.length == 3)
  }

  test("resizeImages: non-square upscale keeps real source values") {
    val px = Array(100, 200) // 2x1
    val m = Seq((1L, grayPng(2, 1, px), "image/png"))
      .toDF("doc_id", "bytes", "mime")
    val r = MultimodalOps.resizeImages(MultimodalOps.decodeImages(m), 4, 2).head()
    assert(r.out_w == 4 && r.out_h == 2)
    assert(r.pixels.toSeq == Seq(100f, 100f, 200f, 200f, 100f, 100f, 200f, 200f))
  }

  test("dHash: deterministic; identical payloads collide; 64-bit shape") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (3L, "a completely different text payload with other bytes"))
      .toDF("doc_id", "text")
    val fp = MultimodalOps.dHash(MultimodalOps.asMedia(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L)) // identical payloads -> identical hash
    assert(fp(1L) != fp(3L)) // different payloads separate
    // re-run is bit-identical (pooled resample + comparisons only)
    val fp2 = MultimodalOps.dHash(MultimodalOps.asMedia(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp == fp2)
  }

  test("dHash + fingerprintPairs: duplicate payloads surface at hamming 0") {
    val docs = Seq(
      (1L, "shared payload body shared payload body shared payload"),
      (2L, "shared payload body shared payload body shared payload"),
      (3L, "unrelated bytes entirely: zzzzzz qqqqqq wwwwww eeeeee"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.fingerprintPairs(
      MultimodalOps.dHash(MultimodalOps.asMedia(docs)), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }
}
