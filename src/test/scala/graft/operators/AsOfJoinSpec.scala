package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")

  test("backward as-of: latest right value at-or-before, inclusive") {
    val left = Seq(
      (1L, 100L, ts(0)), (2L, 100L, ts(1)), (3L, 100L, ts(3)), (4L, 100L, ts(7)),
      (5L, 200L, ts(2))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts(1), 10.0), (100L, ts(5), 50.0),
      (200L, ts(9), 99.0)
    ).toDF("user_id", "rts", "val")

    val out = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "rts", Seq("val"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, null), // before any right row
      (2L, 10.0), // equal timestamp → inclusive
      (3L, 10.0), // carried forward
      (4L, 50.0), // newer right row wins
      (5L, null)  // right row is in the future
    ))
  }

  test("payload stays null-typed and left row count is preserved") {
    val left = Seq((1L, 9L, ts(0))).toDF("event_id", "user_id", "ts")
    val right = Seq((8L, ts(0), 1.0)).toDF("user_id", "rts", "val")
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "rts", Seq("val"))
    assert(out.count() == 1)
    assert(out.head().isNullAt(3)) // no matching key
  }
}
