package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Deterministic log-bucket quantile histogram (DDSketch family):
  * RELATIVE-error accuracy (≤ α by construction, asserted at α),
  * bit-identical bytes across partitionings (merge = bucket addition,
  * a commutative monoid — the property the randomized KLL cannot
  * offer), partial→merge BYTE equality with the one-pass sketch,
  * sign/zero handling, empty→NaN, α-mismatch rejection, and
  * SQL-dialect visibility. */
class LogHistogramSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private val n = 20000
  private def uniform = (1 to n).map(_.toDouble).toDF("v")
    .repartition(8) // force multi-partition partials + a merge path

  test("every decile estimate within 0.5% RELATIVE error on 1..20000") {
    val sk = uniform.agg(SketchFunctions.logHistAgg(col("v")).as("sk"))
    for (q <- 1 to 9; rank = q / 10.0) {
      val est = sk.select(
        SketchFunctions.logHistQuantile(col("sk"), lit(rank))).head()
        .getDouble(0)
      val truth = math.ceil(rank * n) // rank-ceil(q·n) item of 1..n
      assert(math.abs(est - truth) <= 0.005 * truth + 1e-9,
        s"rank $rank: est $est vs true $truth")
    }
  }

  test("bytes are bit-identical across partitionings and merge trees") {
    def bytes(parts: Int): Seq[Byte] =
      (1 to n).map(_.toDouble).toDF("v").repartition(parts)
        .agg(SketchFunctions.logHistAgg(col("v")).as("sk"))
        .head().getAs[Array[Byte]](0).toSeq
    val one = bytes(1)
    assert(bytes(7) == one && bytes(32) == one,
      "sketch bytes must not depend on partitioning / merge order")
  }

  test("grouped partials rolled up with logHistMerge equal the one-pass " +
      "sketch BYTE-FOR-BYTE (the q161 shape)") {
    val direct = uniform
      .agg(SketchFunctions.logHistAgg(col("v")).as("sk"))
      .head().getAs[Array[Byte]](0).toSeq
    val rolled = uniform.withColumn("g", pmod(hash(col("v")), lit(8)))
      .groupBy(col("g")).agg(SketchFunctions.logHistAgg(col("v")).as("sk"))
      .agg(SketchFunctions.logHistMerge(col("sk")).as("msk"))
      .head().getAs[Array[Byte]](0).toSeq
    assert(rolled == direct)
  }

  test("negatives and zeros order correctly through the quantile walk") {
    val df = Seq(-100.0, -1.0, 0.0, 0.0, 1.0, 100.0).toDF("v")
    val sk = df.agg(SketchFunctions.logHistAgg(col("v")).as("sk"))
    val row = sk.select(
      SketchFunctions.logHistQuantile(col("sk"), lit(0.0)).as("lo"),
      SketchFunctions.logHistQuantile(col("sk"), lit(0.5)).as("mid"),
      SketchFunctions.logHistQuantile(col("sk"), lit(1.0)).as("hi")).head()
    assert(math.abs(row.getDouble(0) + 100.0) <= 0.5 + 1e-9) // ≈ −100
    assert(row.getDouble(1) == 0.0) // rank 3 of 6 lands on a zero
    assert(math.abs(row.getDouble(2) - 100.0) <= 0.5 + 1e-9) // ≈ +100
  }

  test("nulls and non-finite inputs are skipped; all-null group → NaN") {
    val df = Seq[Option[Double]](Some(2d), None, Some(Double.NaN),
      Some(Double.PositiveInfinity), Some(4d)).toDF("v")
    val q = df.agg(SketchFunctions.logHistAgg(col("v")).as("sk"))
      .select(SketchFunctions.logHistQuantile(col("sk"), lit(1.0))).head()
      .getDouble(0)
    assert(math.abs(q - 4.0) <= 0.02 + 1e-9) // max of the 2 finite values
    val empty = Seq[Option[Double]](None, None).toDF("v")
      .agg(SketchFunctions.logHistAgg(col("v")).as("sk"))
      .select(SketchFunctions.logHistQuantile(col("sk"), lit(0.5))).head()
      .getDouble(0)
    assert(empty.isNaN)
  }

  test("merging sketches with different alpha is rejected") {
    val a = new LogHist(0.005)
    a.add(1.0, 1L)
    val b = new LogHist(0.01)
    b.add(2.0, 1L)
    intercept[IllegalArgumentException] { a.mergeIn(b) }
  }

  test("logHistMerge adopts the inputs' alpha — no repeated parameter") {
    // Partials built at a NON-default alpha roll up through the
    // default-parameter merge: the buffer adopts the first non-empty
    // input's alpha (it is serialized in every sketch) instead of
    // failing the mergeIn require against the default.
    val rolled = uniform.withColumn("g", pmod(hash(col("v")), lit(8)))
      .groupBy(col("g"))
      .agg(SketchFunctions.logHistAgg(col("v"), alpha = 0.05).as("sk"))
      .agg(SketchFunctions.logHistMerge(col("sk")).as("msk"))
      .select(SketchFunctions.logHistQuantile(col("msk"), lit(0.5))).head()
      .getDouble(0)
    assert(math.abs(rolled - n / 2.0) <= 0.05 * n / 2.0 + 1.0)
  }

  test("property: bucket/estimate honors the relative-error and order " +
      "contracts over random finite doubles") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val alphaGen = Gen.oneOf(0.005, 0.01, 0.05)
    // Magnitudes across ~30 decades either side of 1, plus sign + zero.
    val vGen: Gen[Double] = Gen.frequency(
      (8, for {
        m <- Gen.chooseNum(-30.0, 30.0)
        s <- Gen.oneOf(1.0, -1.0)
        f <- Gen.chooseNum(1.0, 9.999)
      } yield s * f * math.pow(10.0, m)),
      (1, Gen.const(0.0)), (1, Gen.const(-0.0)))
    val p1 = Prop.forAll(vGen, alphaGen) { (v, a) =>
      // estimate(bucket(v)) within a·|v| of v (exact for zero)
      val e = LogHistAlgo.estimate(LogHistAlgo.bucket(v, a), a)
      if (v == 0.0) e == 0.0
      else math.abs(e - v) <= a * math.abs(v) * (1 + 1e-12)
    }
    val p2 = Prop.forAll(vGen, vGen, alphaGen) { (x, y, a) =>
      // bucketing is monotone: x <= y never reorders the estimates
      val (lo, hi) = if (x <= y) (x, y) else (y, x)
      LogHistAlgo.estimate(LogHistAlgo.bucket(lo, a), a) <=
        LogHistAlgo.estimate(LogHistAlgo.bucket(hi, a), a)
    }
    Seq(p1, p2).foreach { p =>
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(500), p)
      assert(res.passed, res.status.toString)
    }
  }

  test("SQL dialect spellings resolve end-to-end") {
    GraftExtensions.register(spark)
    uniform.createOrReplaceTempView("lh_t")
    val got = spark.sql(
      """SELECT log_hist_quantile(log_hist_merge_agg(sk), 0.5d) AS p50 FROM (
        |  SELECT log_hist_agg(v) AS sk FROM lh_t
        |  GROUP BY CAST(v AS BIGINT) % 4)""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(got - n / 2.0) <= 0.005 * n / 2.0 + 1.0)
    // The optional alpha literal (SQL numerics parse as DECIMAL —
    // litDouble handles the conversion) matches the Column API.
    val loose = spark.sql(
      """SELECT log_hist_quantile(log_hist_merge_agg(sk), 0.9d) AS p90 FROM (
        |  SELECT log_hist_agg(v, 0.05) AS sk FROM lh_t
        |  GROUP BY CAST(v AS BIGINT) % 4)""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(loose - 0.9 * n) <= 0.05 * 0.9 * n + 1.0)
  }
}
