package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** CDC stream → PartitionedMerge per micro-batch: last change per key
  * wins within a batch, only touched partitions rewritten, inserts and
  * updates both land. */
class UpsertStreamSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("streamed CDC upserts materialize; last change per key wins") {
    val dir = Files.createTempDirectory("upsert-stream").toString
    // seed table: two partitions
    Seq((1L, "a", "v1"), (2L, "a", "v2"), (3L, "b", "v3"))
      .toDF("k", "part", "v")
      .write.partitionBy("part").parquet(s"$dir/table")
    val untouched = new java.io.File(s"$dir/table/part=b").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))

    // CDC feed: k=1 changed twice (ts 10 then 20 — 20 must win),
    // k=9 inserted; only partition "a" touched.
    Seq((1L, "a", "v1-old", 10L), (1L, "a", "v1-new", 20L),
      (9L, "a", "v9", 15L))
      .toDF("k", "part", "v", "ts")
      .write.json(s"$dir/cdc")

    val cdc = spark.readStream
      .schema("k LONG, part STRING, v STRING, ts LONG")
      .json(s"$dir/cdc")
    val q = StreamOps
      .upsertStream(cdc, s"$dir/table", "part", Seq("k", "part"), "ts")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val rows = spark.read.parquet(s"$dir/table")
      .select("k", "part", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(rows.toSeq == Seq((1L, "a", "v1-new"), (2L, "a", "v2"),
      (3L, "b", "v3"), (9L, "a", "v9")))
    // partition b was never rewritten
    val after = new java.io.File(s"$dir/table/part=b").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    assert(after.toSeq == untouched.toSeq)
  }

  test("equal-orderCol changes resolve deterministically (replay-stable)") {
    val dir = Files.createTempDirectory("upsert-tie").toString
    Seq((1L, "a", "seed")).toDF("k", "part", "v")
      .write.partitionBy("part").parquet(s"$dir/table")
    // Two changes for k=1 with the SAME ts: the tie must break on the
    // remaining columns (v desc), not on partition-iteration order — a
    // replayed micro-batch re-running this decision must pick the same
    // winner. Here 'y-wins' > 'x-loses' lexicographically.
    Seq((1L, "a", "x-loses", 10L), (1L, "a", "y-wins", 10L))
      .toDF("k", "part", "v", "ts")
      .write.json(s"$dir/cdc")
    val cdc = spark.readStream
      .schema("k LONG, part STRING, v STRING, ts LONG")
      .json(s"$dir/cdc")
    val q = StreamOps
      .upsertStream(cdc, s"$dir/table", "part", Seq("k", "part"), "ts")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val v = spark.read.parquet(s"$dir/table")
      .filter(col("k") === 1L).select("v").head().getString(0)
    assert(v == "y-wins")
  }
}
