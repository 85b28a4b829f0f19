package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class DedupeStreamSpec extends AnyFunSuite with SparkTestBase {

  test("dropDuplicatesWithinWatermark keeps first occurrence per id") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("dedupe_in").toString + "/in"
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    Seq(
      (1L, ts(0), "first"), (1L, ts(5), "dup-within-watermark"),
      (2L, ts(1), "only"),
      (99L, Timestamp.valueOf("2026-02-01 00:00:00"), "sentinel"))
      .toDF("doc_id", "ts", "tag").coalesce(1).write.parquet(dir)

    val stream = spark.readStream
      .schema("doc_id BIGINT, ts TIMESTAMP, tag STRING").parquet(dir)
    val q = StreamOps.dedupeStream(stream, Seq("doc_id"), watermark = "30 minutes")
      .writeStream.format("memory").queryName("dedupe_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val out = spark.table("dedupe_out").filter($"doc_id" < 99)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq((1L, "first"), (2L, "only")))
  }
}
