package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** ExactQuantile must reproduce Spark's exact `percentile` aggregate (the
  * QUANTILE_CONT definition) while keeping every buffer bounded. */
class ExactQuantileSpec extends AnyFunSuite with SparkTestBase {

  private val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
  private val names = ps.map(p => s"p${(p * 100).toInt}")

  private def viaSparkPercentile(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g"))
      .agg(ps.zip(names).map { case (p, n) =>
        expr(s"percentile(v, $p)").as(n)
      }.head, ps.zip(names).map { case (p, n) =>
        expr(s"percentile(v, $p)").as(n)
      }.tail: _*)

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      Option(r.getString(0)) -> names.indices.map(i =>
        if (r.isNullAt(i + 1)) null else r.getDouble(i + 1)).toSeq
    }.toMap

  test("matches Spark percentile on skewed random data incl. ties and NULLs") {
    import graft.SparkTestBase.spark.implicits._
    val rnd = new scala.util.Random(7)
    // 80% hot group, values drawn from just 20 distincts → heavy ties;
    // every 9th value NULL; one NULL group key; one singleton group.
    val rows = (1 to 5000).map { i =>
      val g = if (i % 50 == 0) None
        else if (rnd.nextInt(10) < 8) Some("hot") else Some(s"g${rnd.nextInt(3)}")
      val v = if (i % 9 == 0) None else Some(rnd.nextInt(20).toDouble)
      (g, v)
    } :+ (Some("single"), Some(42.0))
    val df = rows.toDF("g", "v")

    val got = collectMap(ExactQuantile.quantiles(df, Seq("g"), "v", ps, names))
    val want = collectMap(viaSparkPercentile(df))
    assert(got.keySet == want.keySet)
    got.foreach { case (g, vs) =>
      vs.zip(want(g)).zip(names).foreach { case ((a, b), n) =>
        assert(a != null && b != null &&
          math.abs(a.asInstanceOf[Double] - b.asInstanceOf[Double]) < 1e-9,
          s"group $g $n: $a vs $b")
      }
    }
  }

  test("interpolates between ranks (QUANTILE_CONT, not nearest-rank)") {
    import graft.SparkTestBase.spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 100.0)).toDF("g", "v")
    val out = ExactQuantile
      .quantiles(df, Seq("g"), "v", Seq(0.25, 0.75), Seq("a25", "a75"))
      .collect()(0)
    // n=3: h(.25)=0.5 → 1.5; h(.75)=1.5 → 51.0
    assert(out.getDouble(1) == 1.5 && out.getDouble(2) == 51.0)
  }

  test("physical plan contains no percentile aggregate and no cartesian") {
    import graft.SparkTestBase.spark.implicits._
    val df = Seq(("a", 1.0)).toDF("g", "v")
    val plan = ExactQuantile.quantiles(df, Seq("g"), "v", Seq(0.5), Seq("p50"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("one full-data shuffle: the cells branch reuses the range exchange") {
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.SparkTestBase.spark.implicits._
    val df = (1 to 500).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
    val out = ExactQuantile.quantiles(df, Seq("g"), "v", Seq(0.5), Seq("p50"))
    // The local rank is a mapPartitions counter (reset per group), not a
    // Window.partitionBy(__pid, g) that would re-shuffle the data; both
    // branches' range exchanges canonicalize identically so AQE runs ONE.
    val rangeShuffles = out.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[RangePartitioning] => e.canonicalized
    }
    assert(rangeShuffles.nonEmpty && rangeShuffles.distinct.size == 1)
    out.collect()
    assert(out.queryExecution.executedPlan.toString.contains("ReusedExchange"))
  }
}
