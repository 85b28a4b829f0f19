package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Hand-computed profiling cases (q73's DuckDB oracle proves the
  * cross-engine half on documents). */
class ProfileOpsSpec extends AnyFunSuite with SparkTestBase {

  test("per-column counts, nulls, distincts, byte-wise min/max") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, Some("b"), Some(10L)),
      (2L, None, Some(10L)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(30L)))
      .toDF("id", "s", "v")
    val out = ProfileOps.profile(df, Seq("id", "s", "v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    assert(out == Seq(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("v", 4L, 1L, 2L, "10", "30")))
  }

  test("single scan: exactly one parquet-free aggregate pass (one wide agg)") {
    val sql = spark
    import sql.implicits._
    val df = (1L to 50L).map(i => (i, s"s$i")).toDF("a", "b")
    val plan = ProfileOps.profile(df, Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    // One Aggregate over the input; the stack-unpivot adds a Generate/Project
    // above it but no second Aggregate or Join of scans.
    assert("(?m)^\\s*[+:]?-?\\s*Aggregate".r.findAllIn(plan).length <= 2, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("approxDistinct swaps exact count_distinct for an HLL sketch") {
    val sql = spark
    import sql.implicits._
    val df = (1L to 100L).map(i => (i, i % 10)).toDF("a", "b")
    val exact = ProfileOps.profile(df, Seq("b"))
    val approx = ProfileOps.profile(df, Seq("b"), approxDistinct = true)
    assert(exact.collect().head.getLong(3) == 10L)
    // HLL is exact at this tiny cardinality too, but goes through the sketch.
    assert(approx.collect().head.getLong(3) == 10L)
    assert(approx.queryExecution.optimizedPlan.toString
      .contains("approx_count_distinct"))
  }
}
