package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The salted as-of variants must be row-identical to the unsalted ones on
  * every input — randomized skewed data, both directions, with and without
  * tolerance, NULL keys and NULL payloads, ties at bucket boundaries. */
class AsOfJoinSaltedSpec extends AnyFunSuite with SparkTestBase {

  // Coarse bucket (size 10 on a long time axis) → many cross-bucket carries.
  private val bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    t => floor(t / lit(10L)).cast("long")

  /** Randomized skewed fixture: 90% of rows on one hot key, times drawn
    * from a small range so same-time ties and empty buckets both occur,
    * every 5th payload NULL, every 11th key NULL. Seeded → reproducible. */
  private def fixture(seed: Long): (DataFrame, DataFrame) = {
    import graft.SparkTestBase.spark.implicits._
    val rnd = new scala.util.Random(seed)
    def key(i: Int): Option[String] =
      if (i % 11 == 0) None
      else if (rnd.nextInt(10) < 9) Some("hot")
      else Some(s"k${rnd.nextInt(4)}")
    val left = (1 to 300)
      .map(i => (key(i), rnd.nextInt(100).toLong))
      .toDF("k", "lt")
    val right = (1 to 200)
      .map { i =>
        val p = if (i % 5 == 0) None else Some(rnd.nextDouble() * 100)
        (key(i), rnd.nextInt(100).toLong, p)
      }
      // the operator contract: right unique per (key, time)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("k", "rt", "price")
    (left, right)
  }

  private def sortedRows(df: DataFrame): Seq[(Option[String], Long, Option[Double])] =
    df.collect().toSeq
      .map(r => (Option(r.getString(0)), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(t => (t._1.getOrElse(""), t._1.isEmpty, t._2, t._3.getOrElse(-1.0)))

  private val tol: Option[(org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column] =
    Some((l, r) => abs(l - r) <= lit(15L))

  for (seed <- Seq(1L, 2L, 3L)) {
    test(s"backwardSalted == backward on skewed random data (seed $seed)") {
      val (l, r) = fixture(seed)
      assert(sortedRows(AsOfJoin.backwardSalted(l, r, Seq("k"), "lt", "rt",
          Seq("price"), bucket))
        == sortedRows(AsOfJoin.backward(l, r, Seq("k"), "lt", "rt",
          Seq("price"))))
    }

    test(s"forwardSalted == forward on skewed random data (seed $seed)") {
      val (l, r) = fixture(seed)
      assert(sortedRows(AsOfJoin.forwardSalted(l, r, Seq("k"), "lt", "rt",
          Seq("price"), bucket))
        == sortedRows(AsOfJoin.forward(l, r, Seq("k"), "lt", "rt",
          Seq("price"))))
    }

    test(s"salted tolerance (spanning buckets) matches unsalted (seed $seed)") {
      val (l, r) = fixture(seed)
      assert(sortedRows(AsOfJoin.backwardSalted(l, r, Seq("k"), "lt", "rt",
          Seq("price"), bucket, tolerance = tol))
        == sortedRows(AsOfJoin.backward(l, r, Seq("k"), "lt", "rt",
          Seq("price"), tolerance = tol)))
      assert(sortedRows(AsOfJoin.forwardSalted(l, r, Seq("k"), "lt", "rt",
          Seq("price"), bucket, tolerance = tol))
        == sortedRows(AsOfJoin.forward(l, r, Seq("k"), "lt", "rt",
          Seq("price"), tolerance = tol)))
    }
  }

  test("carry-in crosses an empty bucket; NULL payload is carried as NULL") {
    import graft.SparkTestBase.spark.implicits._
    // right rows only in bucket 0; left rows in buckets 1, 2 and 5 → all
    // resolve purely from carry-in across one or more EMPTY buckets.
    // rt=9's payload is NULL and is the as-of row for every left row —
    // the carry must yield NULL, not 1.0 from rt=5.
    val left = Seq(("a", 18L), ("a", 27L), ("a", 55L)).toDF("k", "lt")
    val right = Seq(("a", 5L, Some(1.0)), ("a", 9L, Option.empty[Double]))
      .toDF("k", "rt", "price")
    val out = AsOfJoin.backwardSalted(left, right, Seq("k"), "lt", "rt",
        Seq("price"), bucket)
      .orderBy("lt").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq == Seq((18L, null), (27L, null), (55L, null)))
  }

  test("forward carry-in comes from LATER buckets") {
    import graft.SparkTestBase.spark.implicits._
    val left = Seq(("a", 3L), ("a", 45L)).toDF("k", "lt")
    val right = Seq(("a", 31L, 7.0)).toDF("k", "rt", "price")
    val out = AsOfJoin.forwardSalted(left, right, Seq("k"), "lt", "rt",
        Seq("price"), bucket)
      .orderBy("lt").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    // lt=3 (bucket 0) looks forward to rt=31 (bucket 3); lt=45 has nothing.
    assert(out.toSeq == Seq((3L, 7.0), (45L, null)))
  }
}
