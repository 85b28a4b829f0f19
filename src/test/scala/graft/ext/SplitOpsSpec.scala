package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The split must be a pure function of the id: stable under
  * repartitioning and appends, roughly proportional, and engine-free
  * arithmetic (the DuckDB oracle of q60 proves the cross-engine half). */
class SplitOpsSpec extends AnyFunSuite with SparkTestBase {

  test("assignment is stable under repartition and append") {
    val sql = spark
    import sql.implicits._
    val base = (0L until 2000L).toDF("id")
    val a = SplitOps.assignSplit(base, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = SplitOps.assignSplit(base.repartition(13), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // An appended corpus never reassigns existing rows:
    val c = SplitOps.assignSplit((0L until 4000L).toDF("id"), "id")
      .filter($"id" < 2000).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == c)
  }

  test("fractions approximate the requested cuts") {
    val sql = spark
    import sql.implicits._
    val n = 20000L
    val counts = SplitOps.assignSplit((0L until n).toDF("id"), "id")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / n.toDouble - 0.90) < 0.02)
    assert(math.abs(counts("val") / n.toDouble - 0.05) < 0.02)
    assert(math.abs(counts("test") / n.toDouble - 0.05) < 0.02)
  }

  test("split plan is a pure projection (no shuffle)") {
    val sql = spark
    import sql.implicits._
    val plan = SplitOps.assignSplit((0L until 10L).toDF("id"), "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("int8 quantization: round-trip error bounded by scale/2, zeros safe") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)), // all-zero vector: scale 0, codes 0
      (3L, Seq(-2.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), col("embedding"),
        SimilarityOps.quantizeInt8(col("embedding")).as("qz"))
      .select(col("vec_id"), col("qz.scale").as("scale"), col("qz.q").as("q"),
        SimilarityOps.dequantizeInt8(col("qz")).as("deq"),
        transform(col("embedding"), x => x.cast("double")).as("orig"))
      .orderBy("vec_id").collect()
    out.foreach { r =>
      val scale = r.getDouble(1)
      val q = r.getSeq[Int](2)
      val deq = r.getSeq[Double](3)
      val orig = r.getSeq[Double](4)
      assert(q.forall(c => c >= -127 && c <= 127))
      orig.zip(deq).foreach { case (o, dq) =>
        assert(math.abs(o - dq) <= scale / 2 + 1e-12, s"vec ${r.getLong(0)}")
      }
    }
    assert(out(1).getDouble(1) == 0.0 && out(1).getSeq[Int](2).forall(_ == 0))
    assert(out(2).getSeq[Int](2) == Seq(-127, 127))
  }

  test("repetitionScores: hand-computed ratios") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, "the the the cat"),      // top 'the' 3/4; bigrams: the-the ×2, the-cat → dup 1/3
      (2L, "a b c d"),              // no repetition
      (3L, "x"),                    // 1 token: both ratios 0
      (4L, "")).toDF("doc_id", "text") // empty: 0 tokens
    val out = TextOps.repetitionScores(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) == ((1L, 4, 0.75, 0.3333)))
    assert(out(1) == ((2L, 4, 0.25, 0.0)))
    assert(out(2) == ((3L, 1, 1.0, 0.0)))
    assert(out(3) == ((4L, 0, 0.0, 0.0)))
  }
}
