package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Fixed-vector correctness for the similarity operators (VERDICT r1: q26
  * needed a non-oracle correctness signal) + LSH plumbing/recall. */
class SimilarityOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def fixture = Seq(
    (1L, Array(1.0f, 0.0f), 1),
    (2L, Array(0.0f, 1.0f), 1),
    (3L, Array(1.0f, 1.0f), 1),
    (4L, Array(-1.0f, 0.0f), 2),
    (5L, Array(-1.0f, -0.1f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("centroidTopK: hand-computed cosines against the label centroid") {
    val out = SimilarityOps.centroidTopK(fixture, k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // label 1 centroid = (2/3, 2/3): cos([1,1]) = 1, cos([1,0]) = 1/sqrt(2)
    assert(out.filter(_._1 == 1).toSeq == Seq(
      (1, 1, 3L, 1.0), (1, 2, 1L, 0.7071), (1, 3, 2L, 0.7071)))
    // label 2 centroid = (-1, -0.05): every vector is scored against every
    // centroid; nearest three are (-1,-0.1), (-1,0), then (0,1).
    val l2 = out.filter(_._1 == 2).toSeq
    assert(l2.map(_._3) == Seq(5L, 4L, 2L))
    assert(l2.map(_._4) == l2.map(_._4).sorted.reverse)
  }

  test("bruteForceKnn: exact neighbors, self excluded") {
    val queries = fixture.filter($"vec_id" === 1L)
    val out = SimilarityOps.bruteForceKnn(fixture, queries, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.forall(_._1 == 1L))
    assert(!out.exists(_._3 == 1L)) // no self-match
    // For [1,0]: best is [1,1] (0.7071), then [0,1] (0), then the negatives.
    assert(out.map(_._3).take(2).toSeq == Seq(3L, 2L))
    assert(out.head._4 == 0.7071)
  }

  test("lshKnn: scoring agrees with brute force on shared pairs; recall > 0") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" <= 3)
    val exact = SimilarityOps.bruteForceKnn(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val approx = SimilarityOps.lshKnn(emb, queries, k = 10, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(approx.nonEmpty)
    val shared = approx.keySet.intersect(exact.keySet)
    assert(shared.nonEmpty, "LSH found none of the true top-10 neighbors")
    // Same pair → identical cosine (identical scoring path):
    shared.foreach { k => assert(math.abs(approx(k) - exact(k)) < 1e-9) }
  }

  test("lshKnn: multi-table candidates are a superset (recall monotone)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" <= 3)
    def pairs(tables: Int) =
      SimilarityOps.lshKnn(emb, queries, k = 50, planes = 6, tables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val one = pairs(1)
    val two = pairs(2)
    // Table 0 of the 2-table run uses the SAME planes as the 1-table run,
    // so (below the k cap) its candidate set can only grow.
    assert(one.subsetOf(two) || two.size >= one.size)
    assert(two.size >= one.size)
  }

  test("lshBucket is deterministic and bounded by plane count") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val b1 = emb.select(SimilarityOps.lshBucket($"embedding", 8).as("b"))
      .collect().map(_.getLong(0))
    val b2 = emb.select(SimilarityOps.lshBucket($"embedding", 8).as("b"))
      .collect().map(_.getLong(0))
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
  }

  test("lshBucketPortable matches a driver-side md5 reference bucket-for-bucket") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 50)
    // Independent reference: md5 first-hex-nibble signs (the projectionSigns
    // rule, seed "lshp", global plane index) over integer micro-unit
    // quantized components — exactly what the q38/q42 DuckDB oracles derive.
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(g: Int, i: Int): Long = {
      md.reset()
      val h = md.digest(s"lshp_${g}_${i}".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1L else -1L
    }
    def refBucket(v: Array[Float], planes: Int, offset: Int): Long =
      (0 until planes).map { p =>
        val dp = v.indices.map(i =>
          sign(offset + p, i) * math.floor(v(i).toDouble * 1e6 + 0.5).toLong).sum
        if (dp >= 0) 1L << p else 0L
      }.sum
    val rows = emb.select($"vec_id",
        SimilarityOps.lshBucketPortable($"embedding", 8).as("b0"),
        SimilarityOps.lshBucketPortable($"embedding", 8, planeOffset = 8).as("b1"),
        $"embedding")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](3).toArray
      assert(r.getLong(1) == refBucket(v, 8, 0), s"vec ${r.getLong(0)} table 0")
      assert(r.getLong(2) == refBucket(v, 8, 8), s"vec ${r.getLong(0)} table 1")
    }
    // Offset planes are a DIFFERENT set (multi-table independence):
    assert(rows.exists(r => r.getLong(1) != r.getLong(2)))
  }

  test("portable lanes refuse a corpus whose dimension mismatches the " +
      "static plane matrix") {
    // 2-dim fixture vs the 64-wide default matrix: a silent zip_with
    // would null every dot and collapse all rows into bucket 0.
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.lshKnn(fixture, fixture.filter($"vec_id" === 1L),
        portable = true)
    }
    assert(e.getMessage.contains("inDim"))
    val e2 = intercept[IllegalArgumentException] {
      DedupOps.embeddingNearDups(fixture, portable = true)
    }
    assert(e2.getMessage.contains("inDim"))
  }

  test("portable lanes: the dim guard checks the QUERY side too, and an " +
      "empty input passes through as an empty result, not a crash") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // 64-dim corpus + 2-dim queries: without the query-side probe every
    // query's dots null out and all queries land in bucket 0 silently.
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.lshKnn(emb, fixture.filter($"vec_id" === 1L),
        portable = true)
    }
    assert(e.getMessage.contains("inDim"))
    // Empty frames must not trip the one-row probe (head on empty):
    val none = fixture.filter($"vec_id" < 0L)
    assert(SimilarityOps.lshKnn(none, none, portable = true).count() == 0L)
    assert(DedupOps.embeddingNearDups(none, portable = true).count() == 0L)
  }

  test("lshKnn portable lane: scoring agrees with brute force; recall > 0") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" <= 3)
    val exact = SimilarityOps.bruteForceKnn(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val approx = SimilarityOps.lshKnn(emb, queries, k = 10, planes = 8,
        tables = 2, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(approx.nonEmpty)
    val shared = approx.keySet.intersect(exact.keySet)
    assert(shared.nonEmpty, "portable LSH found none of the true top-10")
    shared.foreach { k => assert(math.abs(approx(k) - exact(k)) < 1e-9) }
  }

  test("semDedup: same-cell near-dups dropped to lowest-id rep, cross-direction pairs kept") {
    // Two 1-D-ish cells: c0 = x-axis, c1 = y-axis.
    val cents = Seq((0L, Array(1.0d, 0.0d)), (1L, Array(0.0d, 1.0d)))
      .toDF("cid", "ce")
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),   // cell 0, kept (lowest id)
      (2L, Array(2.0f, 0.0f)),   // cell 0, cos(1,2) = 1 → dup of 1
      (3L, Array(0.9f, 0.4f)),   // cell 0, cos to 1 = 0.9139 < τ → kept
      (4L, Array(0.0f, 1.0f)),   // cell 1, kept
      (5L, Array(0.0f, 3.0f))    // cell 1, dup of 4
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.semDedup(corpus, cents, tau = 0.999)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(out(1L) == ((1, -1L)))
    assert(out(2L) == ((0, 1L)))
    assert(out(3L) == ((1, -1L)))
    assert(out(4L) == ((1, -1L)))
    assert(out(5L) == ((0, 4L)))
  }

  test("semDedup: chain dedups to the first representative, not transitively re-kept") {
    val cents = Seq((0L, Array(1.0d, 0.0d))).toDF("cid", "ce")
    // All colinear → all in cell 0, all pairwise cos = 1.
    val corpus = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(4.0f, 0.0f)),
      (12L, Array(0.5f, 0.0f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.semDedup(corpus, cents)
      .collect().map(r => (r.getLong(0), r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq((10L, 1, -1L), (11L, 0, 10L), (12L, 0, 10L)))
  }

  test("randomProject matches a driver-side reference; deterministic") {
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 20L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
    val signs = SimilarityOps.projectionSigns("rp", 4, 16)
    def ref(v: Array[Float]): Seq[Double] = (0 until 4).map { j =>
      val s = v.indices.foldLeft(0.0d)((acc, i) =>
        acc + v(i).toDouble * signs(j)(i))
      math.floor(s * 10000 + 0.5) / 10000
    }
    val out = SimilarityOps.randomProject(df, 4, 16)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    rows.foreach { case (id, v) =>
      assert(out(id.toInt)._2 == ref(v), s"vec $id")
    }
    // signs are ±1 and reproducible
    assert(signs.flatten.forall(s => s == 1.0d || s == -1.0d))
    assert(SimilarityOps.projectionSigns("rp", 4, 16).map(_.toSeq).toSeq
      == signs.map(_.toSeq).toSeq)
  }

  test("randomProject approximately preserves cosine geometry (JL)") {
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(11)
    // 3 well-separated clusters in 64d; projection to 16d must keep
    // within-cluster cosines above cross-cluster ones on average.
    val base = Array.fill(3)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 30).map { k =>
      val c = k % 3
      (k.toLong, c, base(c).map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }
    val df = rows.map { case (id, _, v) => (id, v) }.toDF("vec_id", "embedding")
    val proj = SimilarityOps.randomProject(df, 16, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byCluster = rows.groupBy(_._2)
    val within = for {
      (_, rs) <- byCluster.toSeq; a <- rs; b <- rs if a._1 < b._1
    } yield cos(proj(a._1), proj(b._1))
    val across = for {
      a <- rows; b <- rows if a._1 < b._1 && a._2 != b._2
    } yield cos(proj(a._1), proj(b._1))
    assert(within.sum / within.size > across.sum / across.size + 0.3,
      s"within ${within.sum / within.size} vs across ${across.sum / across.size}")
  }
}
