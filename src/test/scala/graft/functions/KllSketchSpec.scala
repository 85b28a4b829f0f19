package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KLL quantile sketch lane: rank accuracy on a known distribution,
  * partial→merge equivalence within the error envelope, null handling,
  * and SQL-dialect visibility. k=200 ⇒ ~1.65% normalized rank error;
  * asserts use a 3% envelope. */
class KllSketchSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private val n = 20000
  private def uniform = (1 to n).map(_.toDouble).toDF("v")
    .repartition(8) // force multi-partition partials + a merge path

  test("one-pass sketch: p50/p90 within 3% rank error on 1..20000") {
    val sk = uniform.agg(SketchFunctions.kllAgg(col("v")).as("sk"))
    val row = sk.select(
      SketchFunctions.kllQuantile(col("sk"), lit(0.5)),
      SketchFunctions.kllQuantile(col("sk"), lit(0.9))).head()
    assert(math.abs(row.getDouble(0) / n - 0.5) < 0.03)
    assert(math.abs(row.getDouble(1) / n - 0.9) < 0.03)
  }

  test("grouped partials merged with kllMerge stay inside the envelope") {
    // 8 hash buckets as "days", then a rollup merge — the q161 shape.
    val daily = uniform.withColumn("g", pmod(hash(col("v")), lit(8)))
      .groupBy(col("g")).agg(SketchFunctions.kllAgg(col("v")).as("sk"))
    val merged = daily.agg(SketchFunctions.kllMerge(col("sk")).as("msk"))
      .select(SketchFunctions.kllQuantile(col("msk"), lit(0.5)).as("p50"),
        SketchFunctions.kllQuantile(col("msk"), lit(0.99)).as("p99"))
      .head()
    assert(math.abs(merged.getDouble(0) / n - 0.5) < 0.03)
    assert(math.abs(merged.getDouble(1) / n - 0.99) < 0.03)
  }

  test("nulls are skipped, not counted") {
    val df = Seq[Option[Double]](Some(1d), None, Some(3d), None, Some(2d))
      .toDF("v")
    val q = df.agg(SketchFunctions.kllAgg(col("v")).as("sk"))
      .select(SketchFunctions.kllQuantile(col("sk"), lit(1.0))).head()
    assert(q.getDouble(0) == 3.0) // max of the 3 non-null values
  }

  test("SQL dialect spellings resolve end-to-end") {
    GraftExtensions.register(spark)
    uniform.createOrReplaceTempView("kll_t")
    val got = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk), 0.5d) AS p50 FROM (
        |  SELECT kll_sketch_agg(v) AS sk FROM kll_t
        |  GROUP BY CAST(v AS BIGINT) % 4)""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(got / n - 0.5) < 0.03)
  }
}
