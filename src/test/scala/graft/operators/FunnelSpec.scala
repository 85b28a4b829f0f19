package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Strict-ordering edge cases for the funnel state machine. */
class FunnelSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("strict after: same-instant next step rejected; out-of-order ignored") {
    val events = Seq(
      // user 1: clean 3-step funnel
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: click at the SAME instant as the view -> not after -> 1;
      // the later click completes step 2, purchase BEFORE it is ignored
      (2L, ts(10), "view"), (2L, ts(10), "click"),
      (2L, ts(15), "purchase"), (2L, ts(20), "click"),
      // user 3: purchase first, never a view -> 0
      (3L, ts(5), "purchase"), (3L, ts(6), "click"),
      // user 4: other event types only -> no row at all
      (4L, ts(5), "error")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.steps(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 2, 3L -> 0))
  }

  test("greedy earliest-match equals the MIN-after recursion on shuffled input") {
    val rnd = new scala.util.Random(5)
    val types = Array("view", "click", "purchase")
    val events = (1L to 40L).flatMap { u =>
      (1 to 15).map(_ => (u, ts(rnd.nextInt(1000).toLong), types(rnd.nextInt(3))))
    }
    val df = rnd.shuffle(events).toDF("user_id", "ts", "event_type")
      .repartition(7)
    val out = Funnel.steps(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // reference: recursive min-after on the driver
    val expected = events.groupBy(_._1).map { case (u, es) =>
      def minAfter(tpe: String, after: Option[Long]): Option[Long] = {
        val c = es.filter(e => e._3 == tpe &&
          after.forall(a => e._2.getTime > a)).map(_._2.getTime)
        if (c.isEmpty) None else Some(c.min)
      }
      val t1 = minAfter("view", None)
      val t2 = t1.flatMap(t => minAfter("click", Some(t)))
      val t3 = t2.flatMap(t => minAfter("purchase", Some(t)))
      u -> Seq(t1, t2, t3).takeWhile(_.isDefined).size
    }
    assert(out == expected)
  }

  test("stepsWithin: gap bound gates each step; boundary is inclusive") {
    val gapUs = 10L * 1000000 // 10 s
    val events = Seq(
      // user 1: click exactly AT the gap boundary -> counts (<=), purchase
      // 1 s later -> 3
      (1L, ts(100), "view"), (1L, ts(110), "click"), (1L, ts(111), "purchase"),
      // user 2: click one past the gap -> funnel stops at 1 even though a
      // purchase follows
      (2L, ts(100), "view"), (2L, ts(111), "click"), (2L, ts(112), "purchase"),
      // user 3: gap measured from the MATCHED click, not the view: click
      // at 105, purchase at 114 (9 s after click, 14 s after view) -> 3
      (3L, ts(100), "view"), (3L, ts(105), "click"), (3L, ts(114), "purchase"),
      // user 4: the earliest click is matched (greedy); purchase within
      // gap of the LATER click only -> stops at 2
      (4L, ts(100), "view"), (4L, ts(101), "click"), (4L, ts(109), "click"),
      (4L, ts(115), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.stepsWithin(events, Seq("view", "click", "purchase"), gapUs)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 3, 4L -> 2))
  }

  test("stepsWithin with a huge gap degenerates to steps") {
    val rnd = new scala.util.Random(11)
    val types = Array("view", "click", "purchase")
    val events = (1L to 25L).flatMap { u =>
      (1 to 12).map(_ => (u, ts(rnd.nextInt(1000).toLong), types(rnd.nextInt(3))))
    }.toDF("user_id", "ts", "event_type")
    val plain = Funnel.steps(events, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val gapped = Funnel.stepsWithin(events, Seq("view", "click", "purchase"),
      maxGapUs = Long.MaxValue / 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(gapped == plain)
  }
}
