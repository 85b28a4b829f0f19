package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Deterministic synchronous LPA: known-graph labels, tie-break rule, and
  * the iteration-constant plan discipline. */
class LabelPropagationSpec extends AnyFunSuite with SparkTestBase {

  private def edgesOf(und: Seq[(Long, Long)]) = {
    val s = graft.SparkTestBase.spark
    import s.implicits._
    val e = und.toDF("src", "dst")
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one bridge resolve to two communities") {
    // 1-2-3 triangle and 10-11-12 triangle, bridge 3-10
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L))
    val got = labelMap(LabelPropagation.run(edgesOf(und), iters = 3))
    // hand-unrolled 3 sync rounds: the left triangle converges on label 1,
    // the right on label 3 (node 3's round-1 label, carried over the
    // bridge) — two communities, exactly the partition expected
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("tie-break picks the smallest label (round-by-round hand check)") {
    // star: center 5 with leaves 1 and 9. Round 1: center sees {1, 9}
    // once each -> tie -> 1; leaves see only {5} -> 5.
    val und = Seq((5L, 1L), (5L, 9L))
    val r1 = labelMap(LabelPropagation.run(edgesOf(und), iters = 1))
    assert(r1 == Map(5L -> 1L, 1L -> 5L, 9L -> 5L))
    // Round 2: center's neighbors both hold 5 -> 5; leaves see center's 1.
    val r2 = labelMap(LabelPropagation.run(edgesOf(und), iters = 2))
    assert(r2 == Map(5L -> 5L, 1L -> 1L, 9L -> 1L))
  }

  test("an isolated pair two-cycles, deterministically (sync LPA property)") {
    // the textbook sync-LPA oscillation: each round the two nodes swap
    // labels — determinism means the oscillation is bit-stable, not hidden
    val und = Seq((7L, 8L))
    assert(labelMap(LabelPropagation.run(edgesOf(und), iters = 3)) ==
      Map(7L -> 8L, 8L -> 7L))
    assert(labelMap(LabelPropagation.run(edgesOf(und), iters = 4)) ==
      Map(7L -> 7L, 8L -> 8L))
  }

  test("plan: no cartesian product and no window in the per-round step") {
    val und = Seq((1L, 2L), (2L, 3L))
    val df = LabelPropagation.run(edgesOf(und), iters = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("WindowExec"))
  }
}
