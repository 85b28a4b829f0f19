package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Product-quantization specs: hand-computed encode/ADC on tiny planted
  * data, recall against the exact scan on real test embeddings, and the
  * plan-shape guarantees (encode is shuffle-free; search never plans a
  * cartesian product). q101 is the declared no_oracle query over this. */
class PqOpsSpec extends AnyFunSuite with SparkTestBase {
  private lazy val sqlc = spark
  import sqlc.implicits._

  // all components exactly representable in float32 so the driver-side
  // reference arithmetic below is bit-identical to Spark's
  private def planted() = Seq(
    // two obvious clusters per subspace: first half near (0,0)/(1,1),
    // second half splits the same way — m=2, subDim=2
    (0L, Array(0.0f, 0.0f, 1.0f, 1.0f)),
    (1L, Array(0.125f, 0.0f, 1.0f, 0.875f)),
    (2L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.875f, 1.0f, 0.0f, 0.125f))
  ).toDF("vec_id", "embedding")

  test("trainCodebooks: dense m·k rows, subDim-length centroids, deterministic") {
    val cb = PqOps.trainCodebooks(planted(), m = 2, k = 2, iters = 2)
    val rows = cb.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    assert(rows.length == 4)
    assert(rows.map(t => (t._1, t._2)).toSet ==
      Set((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(rows.forall(_._3.length == 2))
    val again = PqOps.trainCodebooks(planted(), m = 2, k = 2, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    assert(rows.toSeq == again.toSeq)
    // with 2 clean clusters per subspace, the 2 codes must land on the
    // cluster means (in some order)
    val sub0 = rows.filter(_._1 == 0).map(_._3.toSeq).toSet
    assert(sub0 == Set(Seq(0.0625d, 0.0d), Seq(0.9375d, 1.0d)))
  }

  test("encode: codes equal the driver-side argmin; projection plan, no shuffle") {
    val cb = PqOps.trainCodebooks(planted(), m = 2, k = 2, iters = 2)
    val cents = cb.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
      .toMap
    val enc = PqOps.encode(planted(), cb)
    val out = enc.collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    planted().collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val exp = (0 until 2).map { s =>
        val sv = v.slice(s * 2, s * 2 + 2)
        (0 until 2).minBy(c =>
          (math.floor(l2(sv, cents((s, c))) * 10000 + 0.5) / 10000, c))
      }
      assert(out(id) == exp, s"vec $id")
    }
    // pure projection: no exchange anywhere in the encode plan
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("searchAdc: scores are exact sums of LUT sub-distances; ranked ascending") {
    val cb = PqOps.trainCodebooks(planted(), m = 2, k = 2, iters = 2)
    val cents = cb.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
      .toMap
    val enc = PqOps.encode(planted(), cb)
    val codes = enc.collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val out = PqOps.searchAdc(enc, cb, planted().filter($"vec_id" === 0L),
      k = 3).collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val q = Array(0.0d, 0.0d, 1.0d, 1.0d)
    def adist(id: Long): Double = {
      val raw = (0 until 2).map { s =>
        l2(q.slice(s * 2, s * 2 + 2), cents((s, codes(id)(s))))
      }.sum
      math.floor(raw * 10000 + 0.5) / 10000
    }
    assert(out.map(_._3).toSet == Set(1L, 2L, 3L)) // self excluded
    out.foreach { case (_, _, id, d) => assert(d == adist(id), s"vec $id") }
    assert(out.sortBy(_._2).map(_._4).toSeq ==
      out.map(_._4).sorted.toSeq) // rk follows ascending distance
    // no cartesian product in the search plan
    val plan = PqOps.searchAdc(enc, cb, planted().filter($"vec_id" === 0L), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("recall vs the exact L2 scan on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // these embeddings are unit-norm with heavy within-cluster noise —
    // a numpy reference implementation of PQ reaches ~0.56–0.74 mean
    // recall@10 at this (m, k); 0.5 is the conservative floor
    val cb = PqOps.trainCodebooks(emb, m = 32, k = 32, iters = 3)
    val enc = PqOps.encode(emb, cb)
    val queries = emb.filter($"vec_id" <= 4)
    val pq = PqOps.searchAdc(enc, cb, queries, k = 10)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // exact L2 top-10 per query, driver-side
    val all = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val recalls = (0L to 4L).map { qid =>
      val exact = (all - qid).toSeq
        .map { case (id, v) => (l2(all(qid), v), id) }
        .sortBy(identity).take(10).map(_._2).toSet
      (pq(qid) & exact).size.toDouble / 10
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 $mean (per-query: $recalls)")
  }
}
