package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Theta sketch lane: distinct estimation accuracy, intersection
  * estimates (the HLL-impossible operation), partial→merge behavior,
  * null handling, SQL-dialect visibility. lgK=12 ⇒ exact below 4096
  * entries, ~1.6% relative error above. */
class ThetaSketchSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("distinct estimate within 5% on 50k longs across partitions") {
    val est = (1L to 50000L).toDF("v").repartition(8)
      .agg(SketchFunctions.thetaAgg(col("v")).as("sk"))
      .select(SketchFunctions.thetaEstimate(col("sk"))).head().getDouble(0)
    assert(math.abs(est / 50000.0 - 1.0) < 0.05, s"est $est")
  }

  test("intersection estimate: known 10k overlap within 8%") {
    val a = (1L to 30000L).toDF("v")
      .agg(SketchFunctions.thetaAgg(col("v")).as("sk"))
    val b = (20001L to 50000L).toDF("v")
      .agg(SketchFunctions.thetaAgg(col("v")).as("sk"))
    val est = a.crossJoin(b.withColumnRenamed("sk", "skb"))
      .select(SketchFunctions.thetaIntersectEstimate(col("sk"), col("skb")))
      .head().getDouble(0)
    assert(math.abs(est / 10000.0 - 1.0) < 0.08, s"intersect est $est")
  }

  test("grouped partials rolled up with thetaMerge ≈ one-pass estimate") {
    val df = (1L to 40000L).toDF("v").repartition(8)
    val onePass = df.agg(SketchFunctions.thetaAgg(col("v")).as("sk"))
      .select(SketchFunctions.thetaEstimate(col("sk"))).head().getDouble(0)
    val merged = df.withColumn("g", pmod(col("v"), lit(16)))
      .groupBy(col("g")).agg(SketchFunctions.thetaAgg(col("v")).as("sk"))
      .agg(SketchFunctions.thetaMerge(col("sk")).as("msk"))
      .select(SketchFunctions.thetaEstimate(col("msk"))).head().getDouble(0)
    assert(math.abs(merged / onePass - 1.0) < 0.05,
      s"merged $merged vs one-pass $onePass")
  }

  test("exact mode below 4096 entries; nulls skipped; strings accepted") {
    val est = Seq[Option[Long]](Some(1L), None, Some(2L), Some(2L), None)
      .toDF("v").agg(SketchFunctions.thetaAgg(col("v")).as("sk"))
      .select(SketchFunctions.thetaEstimate(col("sk"))).head().getDouble(0)
    assert(est == 2.0) // exact mode: 2 distinct non-null values
    val sEst = Seq("x", "y", "x").toDF("v")
      .agg(SketchFunctions.thetaAgg(col("v")).as("sk"))
      .select(SketchFunctions.thetaEstimate(col("sk"))).head().getDouble(0)
    assert(sEst == 2.0)
  }

  test("SQL dialect spellings resolve end-to-end") {
    GraftExtensions.register(spark)
    (1L to 1000L).toDF("v").createOrReplaceTempView("theta_t")
    val got = spark.sql(
      """SELECT theta_estimate(theta_merge_agg(sk)) AS est FROM (
        |  SELECT theta_sketch_agg(v) AS sk FROM theta_t GROUP BY v % 4)
        |""".stripMargin).head().getDouble(0)
    assert(got == 1000.0) // exact mode end-to-end
  }
}
