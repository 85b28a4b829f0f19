package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Bounded multi-source BFS: hand-checked distances on a known graph,
  * frontier semantics (settled nodes never re-expand), and depth
  * bounding. */
class BfsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  // path 1-2-3-4-5 plus a shortcut 1-4 and an unreachable island 9-10
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (9L, 10L))
    .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    .toDF("src", "dst")

  private def run(seedIds: Seq[Long], depth: Int): Map[Long, Int] =
    Bfs.distances(edges, seedIds.toDF("node"), depth)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("single source: shortcut wins over the long path") {
    val d = run(Seq(1L), 4)
    assert(d == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
  }

  test("multi-source takes the minimum over seeds") {
    val d = run(Seq(1L, 5L), 2)
    assert(d(5L) == 0 && d(4L) == 1 && d(3L) == 2 && d(2L) == 1)
  }

  test("depth bound cuts the walk; unreachable island absent") {
    val d = run(Seq(1L), 1)
    assert(d == Map(1L -> 0, 2L -> 1, 4L -> 1))
    assert(!run(Seq(1L), 4).contains(9L))
  }

  test("depth 0 returns exactly the distinct seed set") {
    val d = run(Seq(3L, 3L), 0)
    assert(d == Map(3L -> 0))
  }

  test("seed on the island stays on the island") {
    val d = run(Seq(9L), 4)
    assert(d == Map(9L -> 0, 10L -> 1))
  }
}
