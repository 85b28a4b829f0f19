package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Streaming sessionization end-to-end: file source → session_window with
  * watermark → append sink; results must agree with the batch analog. */
class StreamOpsSpec extends AnyFunSuite with SparkTestBase {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("streaming session_window matches gap semantics (30 min)") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("stream_in").toString + "/in"
    // user 1: two sessions (gap > 30 min between minute 0-10 and minute 50);
    // user 2: one session. Sentinel event far in the future advances the
    // watermark past every real session so append mode emits them all.
    val rows = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(50)),
      (2L, ts(5)), (2L, ts(20)),
      (99L, Timestamp.valueOf("2026-02-01 00:00:00")))
    rows.toDF("user_id", "ts").coalesce(1).write.parquet(dir)

    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP")
      .parquet(dir)
    val out = StreamOps.sessionize(stream, gap = "30 minutes", watermark = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val sessions = spark.table("sessions_out")
      .filter($"user_id" < 99)
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
    assert(sessions.toSeq == Seq(
      (1L, ts(0), 2L),  // minute 0 + 10 merge (gap 10 < 30)
      (1L, ts(50), 1L), // minute 50 is a new session
      (2L, ts(5), 2L))) // 5 + 20 merge
  }

  test("enrichStream: dim refresh between runs is visible per micro-batch") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("enrich").toString
    val inDir = s"$base/in"
    val dimDir = s"$base/dim"
    Seq((1L, "US")).toDF("user_id", "country").write.parquet(dimDir)
    Seq((1L, 10.0), (2L, 20.0)).toDF("user_id", "v")
      .coalesce(1).write.parquet(inDir)

    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var runNo = 0
    def runOnce(): Unit = {
      runNo += 1
      val stream = spark.readStream
        .schema("user_id BIGINT, v DOUBLE").parquet(inDir)
      val q = StreamOps.enrichStream(stream, dimDir, "user_id") {
        (batch, _) =>
          out ++= batch.collect().map(r =>
            (r.getLong(0), Option(r.getString(2)).getOrElse("?")))
          ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt_$runNo")
        .start()
      q.awaitTermination(120000)
      ()
    }
    runOnce()
    assert(out.sorted.toSeq == Seq((1L, "US"), (2L, "?")))
    // dim gains user 2 — the next run's batches see the NEW snapshot
    out.clear()
    Seq((1L, "US"), (2L, "DE")).toDF("user_id", "country")
      .write.mode("overwrite").parquet(dimDir)
    runOnce()
    assert(out.sorted.toSeq == Seq((1L, "US"), (2L, "DE")))
  }

  test("streaming windowed HLL distinct: sketch state, exact at low card") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("stream_hll").toString + "/in"
    // window 10:00-11:00: type a has users {1,2,3} (user 2 twice —
    // dedup inside the sketch), type b has {7}; window 11:00-12:00:
    // type a has {4,5}. Sentinel advances the watermark.
    val rows = Seq(
      ("a", 1L, ts(0)), ("a", 2L, ts(10)), ("a", 2L, ts(20)),
      ("a", 3L, ts(30)), ("b", 7L, ts(15)),
      ("a", 4L, Timestamp.valueOf("2026-01-01 11:05:00")),
      ("a", 5L, Timestamp.valueOf("2026-01-01 11:45:00")),
      ("zz", 0L, Timestamp.valueOf("2026-02-01 00:00:00")))
    rows.toDF("event_type", "user_id", "ts").coalesce(1).write.parquet(dir)

    val stream = spark.readStream
      .schema("event_type STRING, user_id BIGINT, ts TIMESTAMP")
      .parquet(dir)
    val out = StreamOps.windowedDistinct(stream,
      window = "1 hour", watermark = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("hll_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("hll_out")
      .filter($"event_type" =!= "zz")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .toSet
    // HLL is exact in sparse mode at these cardinalities.
    assert(got == Set(
      ("a", ts(0), 3L),
      ("b", ts(0), 1L),
      ("a", Timestamp.valueOf("2026-01-01 11:00:00"), 2L)))
  }

  test("stream-stream interval join pairs rows within the time bound") {
    val sql = spark
    import sql.implicits._
    val ldir = Files.createTempDirectory("stream_jl").toString + "/in"
    val rdir = Files.createTempDirectory("stream_jr").toString + "/in"
    // clicks at minute 0 and 50; purchases at minutes 10 (pairs with 0,
    // within 30m) and 55 (pairs with 50). Purchase at minute 10 is 40m
    // from the minute-50 click — outside the bound.
    Seq((1L, ts(0), "c0"), (1L, ts(50), "c50"))
      .toDF("user_id", "lt", "click").coalesce(1).write.parquet(ldir)
    Seq((1L, ts(10), 5.0), (1L, ts(55), 7.0))
      .toDF("user_id", "rt", "amount").coalesce(1).write.parquet(rdir)

    val ls = spark.readStream
      .schema("user_id BIGINT, lt TIMESTAMP, click STRING").parquet(ldir)
    val rs = spark.readStream
      .schema("user_id BIGINT, rt TIMESTAMP, amount DOUBLE").parquet(rdir)
    val q = StreamOps.intervalJoin(ls, rs, Seq("user_id"), "lt", "rt",
      before = "30 minutes", after = "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val pairs = spark.table("ij_out")
      .select("click", "amount").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(pairs == Set(("c0", 5.0), ("c50", 7.0)))
  }

  test("windowedCounts groups by tumbling event-time window") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("stream_w").toString + "/in"
    Seq(
      ("click", ts(0)), ("click", ts(30)), ("view", ts(10)),
      ("late", Timestamp.valueOf("2026-02-01 00:00:00")))
      .toDF("event_type", "ts").coalesce(1).write.parquet(dir)
    val stream = spark.readStream.schema("event_type STRING, ts TIMESTAMP").parquet(dir)
    val q = StreamOps.windowedCounts(stream, window = "1 hour", watermark = "0 seconds")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val counts = spark.table("win_out").filter($"event_type" =!= "late")
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(counts.toSeq == Seq(("click", 2L), ("view", 1L)))
  }
}
