package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class TrianglesSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def count(edges: Seq[(Long, Long)], parts: Int = 4) =
    Triangles.perNode(edges.toDF("u", "v").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand graphs: K4, triangle with pendant, square") {
    // K4: every node sits in C(3,2) = 3 triangles
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(count(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // triangle 1-2-3 with pendant 4: pendant not in any triangle → no row
    val pend = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(count(pend) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // 4-cycle: no triangles at all
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(count(square) == Map.empty)
  }

  test("duplicate, reversed, and self-loop edges collapse before counting") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(count(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches brute force on random graphs, independent of partitioning") {
    val rnd = new scala.util.Random(19)
    val edges = (1 to 400)
      .map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    // brute force: canonical a<b edge set, count closed a<b<c wedges
    val es = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val ns = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val brute = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      a <- ns; b <- ns if a < b && es((a, b))
      c <- ns if b < c && es((b, c)) && es((a, c))
    } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
    for (parts <- Seq(1, 7)) {
      val got = count(edges, parts)
      assert(got == brute.toMap, s"parts=$parts")
    }
  }
}
