package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Fixture-schema tolerance contract (VERDICT r8 #3).
  *
  * The driver's test fixtures have shipped the events `ts` column as BOTH
  * INT64 TIMESTAMP(NANOS) (rounds 1–7) and native TIMESTAMP(MICROS) (round 8
  * refresh) — the r8 refresh silently broke all 20 events queries because the
  * loader hard-coded the nanos workaround. This spec pins the loader's
  * adaptive behavior against synthetic files of both generations so the next
  * upstream type drift fails HERE, loudly, instead of zeroing out 14% of the
  * query inventory at the driver.
  */
class FixtureCompatSpec extends AnyFunSuite with SparkTestBase {

  // One logical dataset, written twice: micros timestamps and raw int64 nanos.
  private val microsTs = Seq(
    (1L, 10L, "purchase", 12.5, "2024-03-01 10:00:00.123456"),
    (2L, 11L, "view", 3.0, "2024-03-01 10:00:01.000001"),
    (3L, 10L, "purchase", 99.0, "2024-03-02 23:59:59.999999"))

  private def baseDf = {
    val s = graft.SparkTestBase.spark
    import s.implicits._
    microsTs.toDF("event_id", "user_id", "event_type", "value", "ts_s")
  }

  private def writeMicros(dir: String): Unit =
    baseDf
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

  // INT64 nanos-since-epoch: what the legacy nanosAsLong conf yields when
  // reading a TIMESTAMP(NANOS) fixture — plus sub-µs digits that the
  // loader must floor-truncate exactly like DuckDB's ns→µs conversion.
  private def writeNanosAsLong(dir: String): Unit =
    baseDf
      .withColumn("ts",
        unix_micros(to_timestamp(col("ts_s"))) * 1000L + lit(789L))
      .drop("ts_s")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

  test("events loader passes native TIMESTAMP(MICROS) fixtures through") {
    val dir = Files.createTempDirectory("fixt-micros").toString
    writeMicros(dir)
    val df = Queries.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
    assert(got === microsTs.map(_._5))
  }

  test("events loader truncates INT64-nanos fixtures to micros") {
    val dir = Files.createTempDirectory("fixt-nanos").toString
    writeNanosAsLong(dir)
    val df = Queries.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
    assert(got === microsTs.map(_._5)) // the +789 ns tail floors away
  }

  test("both fixture generations load to identical rows") {
    val dirA = Files.createTempDirectory("fixt-a").toString
    val dirB = Files.createTempDirectory("fixt-b").toString
    writeMicros(dirA); writeNanosAsLong(dirB)
    val a = Queries.events(spark, dirA).orderBy("event_id").collect().toSeq
    val b = Queries.events(spark, dirB)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .orderBy("event_id").collect().toSeq
    val aAligned = Queries.events(spark, dirA)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .orderBy("event_id").collect().toSeq
    assert(aAligned === b)
    assert(a.nonEmpty)
  }

  test("the real driver fixture loads and ts is a usable timestamp") {
    val sfDir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$sfDir/events.parquet").exists()) {
      val df = Queries.events(spark, sfDir)
      assert(df.schema("ts").dataType === TimestampType)
      // A timestamp-typed predicate must analyze AND return rows — this is
      // the exact call shape that threw DATATYPE_MISMATCH in round 8.
      val n = df.filter(col("ts") >= lit("2024-01-01").cast(TimestampType)).count()
      assert(n > 0)
    }
  }
}
