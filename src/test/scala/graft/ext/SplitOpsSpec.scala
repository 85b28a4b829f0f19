package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The split must be a pure function of the id: stable under
  * repartitioning and appends, roughly proportional, and engine-free
  * arithmetic (the DuckDB oracle of q60 proves the cross-engine half). */
class SplitOpsSpec extends AnyFunSuite with SparkTestBase {

  test("assignment is stable under repartition and append") {
    val sql = spark
    import sql.implicits._
    val base = (0L until 2000L).toDF("id")
    val a = SplitOps.assignSplit(base, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = SplitOps.assignSplit(base.repartition(13), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // An appended corpus never reassigns existing rows:
    val c = SplitOps.assignSplit((0L until 4000L).toDF("id"), "id")
      .filter($"id" < 2000).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == c)
  }

  test("fractions approximate the requested cuts") {
    val sql = spark
    import sql.implicits._
    val n = 20000L
    val counts = SplitOps.assignSplit((0L until n).toDF("id"), "id")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / n.toDouble - 0.90) < 0.02)
    assert(math.abs(counts("val") / n.toDouble - 0.05) < 0.02)
    assert(math.abs(counts("test") / n.toDouble - 0.05) < 0.02)
  }

  test("split plan is a pure projection (no shuffle)") {
    val sql = spark
    import sql.implicits._
    val plan = SplitOps.assignSplit((0L until 10L).toDF("id"), "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("repetitionScores: hand-computed ratios") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, "the the the cat"),      // top 'the' 3/4; bigrams: the-the ×2, the-cat → dup 1/3
      (2L, "a b c d"),              // no repetition
      (3L, "x"),                    // 1 token: both ratios 0
      (4L, "")).toDF("doc_id", "text") // empty: 0 tokens
    val out = TextOps.repetitionScores(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) == ((1L, 4, 0.75, 0.3333)))
    assert(out(1) == ((2L, 4, 0.25, 0.0)))
    assert(out(2) == ((3L, 1, 1.0, 0.0)))
    assert(out(3) == ((4L, 0, 0.0, 0.0)))
  }
}
