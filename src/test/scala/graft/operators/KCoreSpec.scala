package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class KCoreSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int,
      parts: Int = 4) =
    KCore.peel(edges.toDF("u", "v").repartition(parts), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a tail: 2-core is the triangle, tail peels off") {
    // 1-2-3 triangle, chain 3-4-5
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    // round 1 removes 5 (deg 1) and 4 loses its support the round after
    assert(peel(g, k = 2, rounds = 3) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("peeling cascades: a chain needs one round per link") {
    // path 1-2-3-4-5: every round strips both endpoints
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(peel(path, k = 2, rounds = 1).keySet == Set(2L, 3L, 4L))
    assert(peel(path, k = 2, rounds = 2) == Map.empty)
  }

  test("K5 survives k=4; rounds beyond the fixpoint change nothing") {
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val expected = (1L to 5L).map(_ -> 4L).toMap
    assert(peel(k5, k = 4, rounds = 1) == expected)
    assert(peel(k5, k = 4, rounds = 4) == expected)
  }

  test("duplicate / reversed / self-loop edges collapse; partition-independent") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (3L, 4L))
    for (parts <- Seq(1, 7))
      assert(peel(messy, k = 2, rounds = 2, parts) ==
        Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"parts=$parts")
  }

  test("matches reference peel on random graphs") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 300)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    var es = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val k = 3
    for (_ <- 1 to 4) {
      val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.collect { case (n, d) if d >= k => n }.toSet
      es = es.filter { case (a, b) => keep(a) && keep(b) }
    }
    val want = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(peel(edges, k, rounds = 4) == want)
  }
}
