package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.types.StructType

/** The source-swap seam: FileSource drives the existing operators
  * unchanged, and KafkaSource's record decode (the only logic the
  * connector doesn't own) is verified against the connector's documented
  * wire schema on static data — no broker needed. */
class StreamSourceSpec extends AnyFunSuite with SparkTestBase {

  private val schema =
    StructType.fromDDL("user_id BIGINT, ts TIMESTAMP, value DOUBLE")

  test("FileSource feeds StreamOps.dedupeStream (same API as Kafka path)") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("ssrc").toString + "/in"
    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    Seq((1L, t0, 5.0), (1L, t0, 5.0), (2L, t0, 7.0),
      (99L, Timestamp.valueOf("2026-02-01 00:00:00"), 0.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.parquet(dir)

    val src: StreamSource = FileSource(dir, schema)
    val q = StreamOps.dedupeStream(src.read(spark), Seq("user_id"),
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("ssrc_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val ids = spark.table("ssrc_out").filter($"user_id" < 99)
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L)) // duplicate user 1 row dropped
  }

  test("KafkaSource builds the connector options from config") {
    val k = KafkaSource("broker1:9092,broker2:9092", "events", schema,
      startingOffsets = "latest", maxOffsetsPerTrigger = Some(100000L))
    assert(k.options == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "events",
      "startingOffsets" -> "latest",
      "maxOffsetsPerTrigger" -> "100000"))
    assert(KafkaSource("b:9092", "t", schema).options
      .get("maxOffsetsPerTrigger").isEmpty)
  }

  test("KafkaSource.decode maps the wire schema to declared rows") {
    val sql = spark
    import sql.implicits._
    // The connector's documented output shape: binary key/value + metadata.
    val wire = Seq(
      ("k1".getBytes, """{"user_id":1,"ts":"2026-01-01 10:00:00","value":5.5}""".getBytes,
        "events", 0, 0L, Timestamp.valueOf("2026-01-01 10:00:01"), 0),
      ("k2".getBytes, """not json""".getBytes,
        "events", 0, 1L, Timestamp.valueOf("2026-01-01 10:00:02"), 0))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType")

    val rows = KafkaSource.decode(wire, schema).collect()
    assert(rows.length == 2)
    val good = rows.find(!_.isNullAt(0)).get
    assert(good.getLong(0) == 1L)
    assert(good.getTimestamp(1) == Timestamp.valueOf("2026-01-01 10:00:00"))
    assert(good.getDouble(2) == 5.5)
    assert(good.getTimestamp(3) == Timestamp.valueOf("2026-01-01 10:00:01"))
    // Malformed payload -> NULL row (stream survives), kafka_ts intact.
    val bad = rows.find(_.isNullAt(0)).get
    assert(bad.isNullAt(1) && bad.isNullAt(2))
    assert(bad.getTimestamp(3) == Timestamp.valueOf("2026-01-01 10:00:02"))
  }
}
