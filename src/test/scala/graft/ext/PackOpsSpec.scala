package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import scala.util.Random

/** Greedy sequence packing: budget respected, nothing lost, oversize docs
  * isolated, deterministic under re-partitioning. */
class PackOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def collectPacks(rows: Seq[(Long, Long)], shards: Int, budget: Long) =
    PackOps.packGreedy(rows.toDF("doc_id", "n_tok"), shards, "n_tok",
      "doc_id", budget)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

  test("every pack stays within budget; every doc packed exactly once") {
    val rnd = new Random(11)
    val rows = (1L to 400L).map(i => (i, 1L + rnd.nextInt(300)))
    val out = collectPacks(rows, shards = 4, budget = 512L)
    assert(out.map(_._1).sorted.toSeq == rows.map(_._1))
    val packTotals = out.groupBy(p => (p._2, p._4)).values.map(_.map(_._3).sum)
    assert(packTotals.forall(_ <= 512L))
    // Greedy fill actually fills: average pack utilization above half.
    val util = packTotals.sum.toDouble / (packTotals.size * 512L)
    assert(util > 0.5, s"utilization $util")
  }

  test("oversize document gets a pack of its own; neighbors unharmed") {
    val rows = Seq((1L, 100L), (2L, 9999L), (3L, 100L), (4L, 100L))
    val out = collectPacks(rows, shards = 1, budget = 300L)
    val packOf = out.map(p => p._1 -> p._4).toMap
    assert(out.count(_._4 == packOf(2L)) == 1) // alone
    val others = out.filterNot(_._1 == 2L)
    assert(others.groupBy(_._4).values.forall(_.map(_._3).sum <= 300L))
  }

  test("same packs from any input partitioning") {
    val rows = (1L to 200L).map(i => (i, (i * 13) % 97 + 1))
    val a = collectPacks(rows, 3, 256L).sortBy(_._1).toSeq
    val b = PackOps.packGreedy(
      rows.toDF("doc_id", "n_tok").repartition(17), 3, "n_tok", "doc_id", 256L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(a == b)
  }
}
