package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming SCD-2 must emit exactly the batch operator's CLOSED
  * intervals, including across micro-batch boundaries (state carries the
  * open interval between batches). */
class Scd2StreamSpec extends AnyFunSuite with SparkTestBase {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  private def batchClosed(rows: Seq[Scd2Obs]) = {
    val sql = spark
    import sql.implicits._
    graft.operators.Scd2.intervals(
      rows.toDF(), Seq("key"), "ts", Seq("v"), "seq")
      .filter(col("valid_to").isNotNull)
      .select("key", "version", "valid_from", "valid_to", "v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getString(4)))
      .sortBy(x => (x._1, x._2)).toSeq
  }

  test("single batch: closed intervals equal the batch operator's") {
    val sql = spark
    import sql.implicits._
    val rows = Seq(
      Scd2Obs(1L, ts(0), 1L, "a"), Scd2Obs(1L, ts(10), 2L, "a"),
      Scd2Obs(1L, ts(20), 3L, "b"), Scd2Obs(1L, ts(30), 4L, null),
      Scd2Obs(1L, ts(40), 5L, "a"),
      Scd2Obs(2L, ts(5), 6L, "x"))
    val dir = Files.createTempDirectory("scd2_in").toString + "/in"
    rows.toDS().coalesce(1).write.parquet(dir)

    val stream = spark.readStream
      .schema(Encoders.product[Scd2Obs].schema)
      .parquet(dir).as(Encoders.product[Scd2Obs])
    val q = StreamOps.scd2Stream(stream).writeStream
      .format("memory").queryName("scd2_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("scd2_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getString(4)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == batchClosed(rows))
    // user 1: a|a → b → NULL → a = 3 closed + 1 open; user 2: 1 open only.
    assert(got.map(_._1).count(_ == 1L) == 3 && !got.exists(_._1 == 2L))
  }

  test("across micro-batches: open interval carries through state") {
    implicit val sqlCtx = spark.sqlContext
    val sql = spark
    import sql.implicits._
    val b1 = Seq(Scd2Obs(1L, ts(0), 1L, "a"), Scd2Obs(1L, ts(10), 2L, "b"))
    val b2 = Seq(Scd2Obs(1L, ts(20), 3L, "b"), Scd2Obs(1L, ts(30), 4L, "c"))
    val mem = MemoryStream[Scd2Obs]
    val q = StreamOps.scd2Stream(mem.toDS()).writeStream
      .format("memory").queryName("scd2_mb")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("scd2_mb").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getString(4)))
      .sortBy(x => (x._1, x._2)).toSeq
    // Closed: v1 [0,10) "a"; v2 [10,30) "b" — b@20 extended the open
    // interval ACROSS the batch boundary instead of opening a new version.
    assert(got == Seq(
      (1L, 1, ts(0), ts(10), "a"),
      (1L, 2, ts(10), ts(30), "b")))
    assert(got == batchClosed(b1 ++ b2))
  }

  test("randomized: stream equals batch for any change log and batch split") {
    implicit val sqlCtx = spark.sqlContext
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(20260812)
    for (trial <- 1 to 3) {
      // Random per-key in-order log: few keys, few values (forces merges),
      // NULLs included, occasional duplicate timestamps (seq breaks ties).
      val values = Array("a", "b", null)
      var minute = 0
      val obs = (1 to 60).map { seq =>
        minute += rnd.nextInt(2) // duplicates when the increment is 0
        Scd2Obs(1L + rnd.nextInt(3), ts(minute), seq.toLong,
          values(rnd.nextInt(values.length)))
      }
      // Split into 1–4 batches at random cut points, stream-order preserved.
      val cuts = (Seq(0, obs.length) ++ Seq.fill(rnd.nextInt(3))(
        rnd.nextInt(obs.length))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => obs.slice(a, b) }

      val mem = MemoryStream[Scd2Obs]
      val q = StreamOps.scd2Stream(mem.toDS()).writeStream
        .format("memory").queryName(s"scd2_rand_$trial")
        .outputMode("append").start()
      batches.filter(_.nonEmpty).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      q.stop()

      val got = spark.table(s"scd2_rand_$trial").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getString(4)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(got == batchClosed(obs), s"trial $trial: cuts=$cuts")
    }
  }
}
