package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Band join: equivalence against brute-force cross+filter, boundary
  * inclusivity, and a plan with no quadratic join operator. */
class RangeJoinSpec extends AnyFunSuite with SparkTestBase {

  test("band join equals brute-force cross+filter on random-ish data") {
    import graft.SparkTestBase.spark.implicits._
    val left = (1 to 60).map(i => (s"k${i % 3}", (i * 7 % 50).toLong, i))
      .toDF("k", "lt", "lid")
    val right = (1 to 60).map(i => (s"k${i % 3}", (i * 11 % 50).toLong, i))
      .toDF("k", "rt", "rid")

    val got = RangeJoin.band(left, right, Seq("k"), "lt", "rt", delta = 5.0)
      .select("k", "lid", "rid").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet

    val want = left.crossJoin(right.withColumnRenamed("k", "k2"))
      .filter($"k" === $"k2" && org.apache.spark.sql.functions.abs($"lt" - $"rt") <= 5)
      .select("k", "lid", "rid").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet

    assert(got == want)
    assert(got.nonEmpty)
  }

  test("delta boundary is inclusive; outside is excluded") {
    import graft.SparkTestBase.spark.implicits._
    val l = Seq(("a", 10L, 1)).toDF("k", "lt", "lid")
    val r = Seq(("a", 15L, 1), ("a", 16L, 2), ("a", 5L, 3), ("a", 4L, 4))
      .toDF("k", "rt", "rid")
    val ids = RangeJoin.band(l, r, Seq("k"), "lt", "rt", delta = 5.0)
      .select("rid").collect().map(_.getInt(0)).toSet
    assert(ids == Set(1, 3)) // 15 and 5 are exactly delta away; 16/4 are not
  }

  test("plan is a hash/sort-merge join — no nested loop, no cartesian") {
    import graft.SparkTestBase.spark.implicits._
    val l = (1 to 1000).map(i => ("k", i.toLong, i)).toDF("k", "lt", "lid")
    val r = (1 to 1000).map(i => ("k", i.toLong, i)).toDF("k", "rt", "rid")
    val plan = RangeJoin.band(l, r, Seq("k"), "lt", "rt", delta = 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
