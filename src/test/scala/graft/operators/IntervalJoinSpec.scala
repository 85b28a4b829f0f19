package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Bucketized interval overlap join: closed-endpoint semantics, the
  * emit-once bucket rule (no duplicate pairs across buckets, no
  * `distinct`), degenerate rows, and brute-force equivalence (the q110
  * DuckDB oracle re-proves it at sf scale against the quadratic join). */
class IntervalJoinSpec extends AnyFunSuite with SparkTestBase {

  private val W = 100L // tiny buckets so intervals span several

  test("hand-planted: endpoint touch counts, disjoint doesn't, once each") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      // key k1: a=[0,250] spans buckets 0-2; b=[250,300] touches at 250;
      // c=[301,400] overlaps b? 301 > 300 → no; d=[90,110] inside a.
      ("k1", 1L, 0L, 250L), ("k1", 2L, 250L, 300L), ("k1", 3L, 301L, 400L),
      ("k1", 4L, 90L, 110L),
      // k2: same span as k1's a — keys don't mix.
      ("k2", 5L, 0L, 250L),
      // degenerate: end < start is dropped even where it would overlap.
      ("k1", 6L, 200L, 100L),
      // NULL key never joins.
      (null.asInstanceOf[String], 7L, 0L, 999L)
    ).toDF("k", "id", "s", "e")
    val out = IntervalJoin.overlapSelfJoin(df, "k", "id", "s", "e", W)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // (1,2): touch at 250 → overlap 0 (closed). (1,4): [90,110] → 20.
    assert(out == Seq(("k1", 1L, 2L, 0L), ("k1", 1L, 4L, 20L)))
  }

  test("equals the brute-force quadratic join on random intervals") {
    val sql = spark
    import sql.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1L to 300L).map { i =>
      val s = rng.nextInt(2000).toLong
      (s"k${rng.nextInt(5)}", i, s, s + rng.nextInt(400).toLong)
    }
    val df = rows.toDF("k", "id", "s", "e")
    val fast = IntervalJoin.overlapSelfJoin(df, "k", "id", "s", "e", W)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val a = df.select(col("k"), col("id").as("a_id"), col("s").as("a_s"),
      col("e").as("a_e"))
    val b = df.select(col("k").as("k2"), col("id").as("b_id"),
      col("s").as("b_s"), col("e").as("b_e"))
    val brute = a.join(b, col("k") === col("k2") &&
        col("a_id") < col("b_id") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("k"), col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .as("o"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(brute.size > 100 && fast == brute)
    // and exactly once each — no cross-bucket duplicates:
    val asSeq = IntervalJoin.overlapSelfJoin(df, "k", "id", "s", "e", W)
      .collect()
    assert(asSeq.length == asSeq.distinct.length && asSeq.length == brute.size)
  }
}
