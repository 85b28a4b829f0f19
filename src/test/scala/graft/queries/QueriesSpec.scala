package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Inventory-level checks for queries without a DuckDB oracle. */
class QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    Queries.all.find(_.name == name).get.fn(spark, sf)

  test("q17b approx distinct within 5% of exact q17") {
    val exact = run("q17_count_distinct").head()
    val approx = run("q17b_approx_distinct").head()
    Seq(0, 1).foreach { i =>
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - e) / e < 0.05, s"col $i: approx $a vs exact $e")
    }
  }

  test("q47b approx percentiles within 2% of exact q47 per group") {
    val exact = run("q47_percentiles").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = run("q47b_approx_percentiles").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, (p50, p90)) =>
      val (a50, a90) = approx(g)
      assert(math.abs(a50 - p50) / p50 < 0.02, s"$g p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.02, s"$g p90: $a90 vs $p90")
    }
  }

  test("every declared query runs and matches its declared column set") {
    Queries.all.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, q.name)
      assert(df.limit(1).collect() != null, q.name)
    }
  }

  test("q38 LSH output is a plan without a cartesian product") {
    val plan = run("q38_ann_lsh").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
