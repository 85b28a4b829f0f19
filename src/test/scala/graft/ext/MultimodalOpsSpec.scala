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
}
