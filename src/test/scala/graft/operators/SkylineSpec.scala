package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestBase

/** Two-phase skyline: hand-computed frontier, brute-force agreement on
  * random data, partitioning invariance, and the PREFERRING dialect
  * translation through the wrapper. */
class SkylineSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("hand-computed frontier: HIGH x, LOW y; ties both kept; nulls excluded") {
    val df = Seq(
      (1L, 10, 5.0),   // dominated by 3 (same x, lower y)
      (2L, 8, 2.0),    // dominated by 7 (higher x, lower y)
      (3L, 10, 3.0),   // frontier
      (4L, 7, 2.0),    // dominated by 2 and 7
      (5L, 12, 9.0),   // frontier (highest x)
      (6L, 8, 2.0),    // tie with 2: not dominated by 2, but 7 kills both
      (7L, 9, 1.0)     // frontier (lowest y)
    ).toDF("id", "x", "y")
    val out = Skyline.pareto(df, Seq(("x", true), ("y", false)))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(3L, 5L, 7L))
    // equal-key ties survive together when nothing else dominates them
    val ties = Seq((1L, 5, 1.0), (2L, 5, 1.0), (3L, 4, 2.0))
      .toDF("id", "x", "y")
    assert(Skyline.pareto(ties, Seq(("x", true), ("y", false)))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val withNull = df.unionByName(
      Seq((8L, Option.empty[Int], Option(0.0))).toDF("id", "x", "y"))
    val out2 = Skyline.pareto(withNull, Seq(("x", true), ("y", false)))
      .collect().map(_.getLong(0)).sorted
    assert(out2.toSeq == Seq(3L, 5L, 7L))
  }

  test("agrees with brute force on random data; invariant to partitioning") {
    val rnd = new scala.util.Random(99)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextInt(50), rnd.nextInt(50), rnd.nextInt(50)))
    def dominates(a: (Long, Int, Int, Int), b: (Long, Int, Int, Int)) =
      a._2 >= b._2 && a._3 <= b._3 && a._4 >= b._4 &&
        (a._2 > b._2 || a._3 < b._3 || a._4 > b._4)
    val expected = rows.filter(r => !rows.exists(q => dominates(q, r)))
      .map(_._1).sorted
    val df = rows.toDF("id", "a", "b", "c")
    val dims = Seq(("a", true), ("b", false), ("c", true))
    val one = Skyline.pareto(df.repartition(1), dims)
      .collect().map(_.getLong(0)).sorted.toSeq
    val many = Skyline.pareto(df.repartition(13), dims)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(one == expected)
    assert(many == expected)
  }

  test("PREFERRING dialect translates through the wrapper and matches the operator") {
    val w = graft.wrapper.QueryWrapper(spark)
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    part.createOrReplaceTempView("part_sky")
    val (ok, res) = w.query(
      """SELECT p_partkey FROM part_sky
        |PREFERRING HIGH p_size PLUS LOW p_retailprice
        |ORDER BY p_partkey""".stripMargin)
    assert(ok, res.error)
    val viaSql = res.rows.map(_.getLong(0))
    val viaOp = Skyline.pareto(part, Seq(("p_size", true), ("p_retailprice", false)))
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted.toSeq
    assert(viaSql.nonEmpty && viaSql.toSeq == viaOp)
  }

  test("PREFERRING with WHERE: skyline of the filtered set") {
    val w = graft.wrapper.QueryWrapper(spark)
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    part.createOrReplaceTempView("part_sky2")
    val (ok, res) = w.query(
      """SELECT p_partkey FROM part_sky2 WHERE p_size <= 25
        |PREFERRING HIGH p_size PLUS LOW p_retailprice
        |ORDER BY p_partkey""".stripMargin)
    assert(ok, res.error)
    val viaSql = res.rows.map(_.getLong(0))
    val viaOp = Skyline.pareto(part.filter(col("p_size") <= 25),
        Seq(("p_size", true), ("p_retailprice", false)))
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted.toSeq
    assert(viaSql.nonEmpty && viaSql.toSeq == viaOp)
  }
}
