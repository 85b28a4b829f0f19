package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** flatMapGroupsWithState sessionization: sessions close when a later
  * event exceeds the gap (same batch) — the custom-state path the built-in
  * session_window can't extend with per-session running values. */
class StatefulSessionSpec extends AnyFunSuite with SparkTestBase {

  test("stateful sessions: gap split, counts and value totals") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("fsess").toString + "/in"
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    Seq(
      // user 1, session A: minutes 0 + 10 (values 1.5 + 2.5);
      // minute 50 starts session B, which closes A in the same batch.
      (1L, ts(0), 1.5), (1L, ts(10), 2.5), (1L, ts(50), 9.0),
      (2L, ts(5), 4.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.parquet(dir)

    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE").parquet(dir)
    val q = StreamOps.statefulSessions(stream, gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("fsess_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val out = spark.table("fsess_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4)))
    // Only session A is closed (by the minute-50 event); open sessions for
    // user 1B and user 2 stay in state awaiting timeout.
    assert(out.toSeq == Seq((1L, ts(0), 2L, 4.0)))
  }
}
