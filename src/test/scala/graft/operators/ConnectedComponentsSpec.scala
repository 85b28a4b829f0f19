package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Min-label propagation must agree with a driver-side union-find on
  * arbitrary graphs, and propagate across chains (transitivity — the case
  * pair-based dedup can't see). */
class ConnectedComponentsSpec extends AnyFunSuite with SparkTestBase {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sql = spark
    import sql.implicits._
    ConnectedComponents.labels(edges.toDF("id1", "id2"), "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
  }

  test("chain propagates transitively; separate components stay apart") {
    // 1-2-3-4 is one component even though 1-4 is not an edge; 10-11 is
    // another; parallel/reversed edges are harmless.
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (10L, 11L), (2L, 1L))
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("matches union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == unionFind(edges))
    }
  }

  private def runLog(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] = {
    val sql = spark
    import sql.implicits._
    ConnectedComponents.labelsLogRounds(
        edges.toDF("id1", "id2"), "id1", "id2", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelsLogRounds matches union-find on random graphs") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
      assert(runLog(edges) == unionFind(edges))
    }
  }

  test("labelsLogRounds handles a 400-node path in logarithmic rounds") {
    // Diameter 399: min-label propagation would need ~400 rounds; the
    // alternating algorithm must finish within 20 — the 100 TB story for
    // long-chain topologies (revision chains, citation paths).
    val path = (1L until 400L).map(i => (i, i + 1))
    val got = runLog(path, maxIter = 20)
    assert(got == (1L to 400L).map(_ -> 1L).toMap)
  }

  test("labelsLogRounds: reversed/parallel edges and two components") {
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (10L, 11L), (2L, 1L))
    assert(runLog(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("non-convergence within maxIter fails loudly instead of silently") {
    val sql = spark
    import sql.implicits._
    // A 6-node path needs ~5 rounds; cap at 1 → must throw, not return
    // half-propagated labels.
    val path = (1L to 5L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.labels(path.toDF("id1", "id2"), "id1", "id2",
        maxIter = 1).collect()
    }
    assert(e.getMessage.contains("converge"))
  }
}
