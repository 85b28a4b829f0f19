package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Hand-computed SCD-2 interval cases (q71's DuckDB oracle proves the
  * cross-engine half on the events table). */
class Scd2Spec extends AnyFunSuite with SparkTestBase {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def build(rows: Seq[(Long, Long, Long, String)]) = {
    val sql = spark
    import sql.implicits._
    Scd2.intervals(
      rows.toDF("k", "sec", "id", "v").withColumn("t", col("sec").cast("timestamp")),
      Seq("k"), "t", Seq("v"), "id")
      .select("k", "version", "valid_from", "valid_to", "v", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getString(4),
        r.getBoolean(5)))
      .sortBy(x => (x._1, x._2)).toSeq
  }

  test("consecutive identical values merge; changes open new intervals") {
    val out = build(Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "a"),
      (2L, 15L, 5L, "x")))
    assert(out == Seq(
      (1L, 1, ts(10), Some(ts(30)), "a", false),
      (1L, 2, ts(30), Some(ts(40)), "b", false),
      (1L, 3, ts(40), None, "a", true),
      (2L, 1, ts(15), None, "x", true)))
  }

  test("NULL-valued first observation still opens interval 1; NULL transitions count") {
    val out = build(Seq(
      (1L, 10L, 1L, null), (1L, 20L, 2L, null), (1L, 30L, 3L, "a"),
      (1L, 40L, 4L, null)))
    assert(out.map(x => (x._2, x._5, x._6)) == Seq(
      (1, null, false), (2, "a", false), (3, null, true)))
    assert(out.head._3 == ts(10) && out.head._4 == Some(ts(30)))
  }

  test("same-timestamp observations order by the tie-breaker") {
    val out = build(Seq(
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 20L, 3L, "b")))
    // id=1 ("a") precedes id=2 ("b") at t=10; the trailing b merges nothing.
    assert(out.map(x => (x._2, x._5)) == Seq((1, "a"), (2, "b")))
    assert(out(1)._3 == ts(10) && out(1)._4.isEmpty)
  }

  test("every window partitions by the key — no unpartitioned window in the plan") {
    val sql = spark
    import sql.implicits._
    val df = Seq((1L, 10L, 1L, "a")).toDF("k", "sec", "id", "v")
      .withColumn("t", col("sec").cast("timestamp"))
    val plan = Scd2.intervals(df, Seq("k"), "t", Seq("v"), "id")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(t"))
    // Spark renders an empty partition spec as `windowspecdefinition(<order>…)`
    // with no partition columns before the sort spec; assert every window
    // spec mentions the key column first.
    "windowspecdefinition\\(([^,]+)".r.findAllMatchIn(plan).foreach { m =>
      assert(m.group(1).startsWith("k#"), plan)
    }
  }
}
