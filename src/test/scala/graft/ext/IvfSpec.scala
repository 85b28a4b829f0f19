package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** IVF ANN + embedding near-dup: scoring agreement with brute force and
  * planted-duplicate recovery. */
class IvfSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("ivfKnn: agrees with brute force on shared pairs; finds neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" <= 3)
    val exact = SimilarityOps.bruteForceKnn(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = SimilarityOps.ivfKnn(emb, queries, k = 10, nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(ivf.nonEmpty)
    val shared = ivf.keySet.intersect(exact.keySet)
    assert(shared.nonEmpty, "IVF found none of the true top-10 neighbors")
    shared.foreach { k => assert(math.abs(ivf(k) - exact(k)) < 1e-9) }
    // Probing 3 of 8 cells must find a decent share of the true top-10:
    val recall = shared.size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("kmeansCentroids is deterministic with the declared cell count") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c1 = SimilarityOps.kmeansCentroids(emb, 8).orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    val c2 = SimilarityOps.kmeansCentroids(emb, 8).orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    assert(c1.toSeq == c2.toSeq)
    assert(c1.length <= 8 && c1.nonEmpty)
  }

  test("embeddingNearDups recovers a planted duplicate at cosine 1.0") {
    val base = Array(0.1f, 0.9f, 0.3f, 0.5f)
    val emb = Seq(
      (1L, base), (2L, base), // exact duplicate pair
      (3L, Array(-0.9f, 0.1f, -0.2f, -0.8f)),
      (4L, Array(0.11f, 0.89f, 0.31f, 0.49f)) // near-dup of 1/2
    ).toDF("vec_id", "embedding")
    val pairs = DedupOps.embeddingNearDups(emb, minCosine = 0.99, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
