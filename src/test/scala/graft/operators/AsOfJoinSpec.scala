package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Backward as-of join semantics, including the nullable-payload contract:
  * a matched right row whose payload is NULL must yield NULL (not an older
  * right row's value), and a left row before any right row yields NULL. */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  test("backward as-of: latest right row at or before each left time") {
    import graft.SparkTestBase.spark.implicits._
    val left = Seq(("a", 1L), ("a", 5L), ("a", 10L), ("b", 3L))
      .toDF("k", "lt")
    val right = Seq(("a", 2L, 100.0), ("a", 5L, 200.0), ("b", 9L, 300.0))
      .toDF("k", "rt", "price")

    val out = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("price"))
      .orderBy("k", "lt")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))

    assert(out.toSeq == Seq(
      ("a", 1L, null),      // before any right row
      ("a", 5L, 200.0),     // inclusive <= picks the same-time right row
      ("a", 10L, 200.0),    // latest at-or-before
      ("b", 3L, null)))     // b's only right row is later
  }

  test("NULL right payload is carried, not skipped for an older value") {
    import graft.SparkTestBase.spark.implicits._
    val left = Seq(("a", 3L), ("a", 7L)).toDF("k", "lt")
    val right = Seq(("a", 1L, Some(100.0)), ("a", 5L, None))
      .toDF("k", "rt", "price")

    val out = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("price"))
      .orderBy("lt")
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))

    // lt=3 sees the rt=1 row (100.0); lt=7's as-of row is rt=5 whose payload
    // is genuinely NULL — it must NOT inherit 100.0 from rt=1.
    assert(out.toSeq == Seq((3L, 100.0), (7L, null)))
  }

  test("forward as-of: earliest right row at or after each left time") {
    import graft.SparkTestBase.spark.implicits._
    val left = Seq(("a", 1L), ("a", 5L), ("a", 10L)).toDF("k", "lt")
    val right = Seq(("a", 2L, 100.0), ("a", 5L, 200.0)).toDF("k", "rt", "price")

    val out = AsOfJoin.forward(left, right, Seq("k"), "lt", "rt", Seq("price"))
      .orderBy("lt")
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))

    assert(out.toSeq == Seq(
      (1L, 100.0),   // earliest at-or-after 1 is rt=2
      (5L, 200.0),   // inclusive >= picks the same-time row
      (10L, null)))  // nothing after 10
  }

  test("tolerance bounds the match window (merge_asof semantics)") {
    import graft.SparkTestBase.spark.implicits._
    import org.apache.spark.sql.functions.lit
    val left = Seq(("a", 10L), ("a", 100L)).toDF("k", "lt")
    val right = Seq(("a", 8L, 1.0)).toDF("k", "rt", "price")

    val out = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("price"),
      tolerance = Some((l, r) => l - r <= lit(5L)))
      .orderBy("lt")
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))

    // lt=10 matches rt=8 within 5; lt=100's as-of row is 92 away → NULL.
    assert(out.toSeq == Seq((10L, 1.0), (100L, null)))
  }

  test("multiple payload columns resolve independently per as-of row") {
    import graft.SparkTestBase.spark.implicits._
    val left = Seq(("a", 6L)).toDF("k", "lt")
    val right = Seq(("a", 2L, Some(1.0), Option.empty[String]),
      ("a", 4L, Option.empty[Double], Some("x")))
      .toDF("k", "rt", "p1", "p2")

    val out = AsOfJoin.backward(
      left, right, Seq("k"), "lt", "rt", Seq("p1", "p2")).collect()(0)
    // Both payloads come from the SAME as-of row (rt=4): p1 NULL, p2 "x" —
    // per-column last() must not mix rows.
    assert(out.isNullAt(2) && out.getString(3) == "x")
  }
}
