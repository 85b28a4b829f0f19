package graft.sources

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Partition-scoped upsert: untouched partitions' files must remain
  * byte-identical; touched partitions get exact upsert semantics. */
class PartitionedMergeSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def fileState(dir: String): Map[String, (Long, Long)] =
    new File(dir).listFiles().filter(_.isFile)
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap

  test("rewrites only the source's partitions; exact upsert within them") {
    val dir = java.nio.file.Files.createTempDirectory("pm").toString + "/t"
    Seq(
      (1L, 0, "a0"), (2L, 0, "b0"),
      (3L, 1, "c0"), (4L, 1, "d0"),
      (5L, 2, "e0"))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    val day0Before = fileState(s"$dir/day=0")
    val day2Before = fileState(s"$dir/day=2")

    // Source touches day=1 only: update id=3, insert id=9.
    val src = Seq((3L, 1, "c1"), (9L, 1, "z1")).toDF("id", "day", "v")
    val stats = PartitionedMerge.upsert(spark, dir, "day", Seq("id", "day"), src)
    assert(stats == UpsertStats(updated = 1, inserted = 1, nPartitions = 1))

    // Untouched partitions: files byte/mtime-identical, not rewritten.
    assert(fileState(s"$dir/day=0") == day0Before)
    assert(fileState(s"$dir/day=2") == day2Before)

    val back = spark.read.parquet(dir).select("id", "day", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(back == Seq(
      (1L, 0, "a0"), (2L, 0, "b0"),
      (3L, 1, "c1"), (4L, 1, "d0"),
      (5L, 2, "e0"), (9L, 1, "z1")))
  }

  test("the pruned scan carries PartitionFilters, not a post-scan filter") {
    val dir = java.nio.file.Files.createTempDirectory("pm2").toString + "/t"
    (0 until 40).map(i => (i.toLong, i % 4, s"v$i")).toDF("id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    import org.apache.spark.sql.functions.col
    val plan = spark.read.parquet(dir).filter(col("day").isin(1, 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"), plan)
  }

  test("empty source is a no-op: zero stats, files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("pm0").toString + "/t"
    Seq((1L, 0, "a"), (2L, 1, "b")).toDF("id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    val before = Seq(0, 1).map(d => fileState(s"$dir/day=$d"))
    val empty = Seq.empty[(Long, Int, String)].toDF("id", "day", "v")
    val stats = PartitionedMerge.upsert(spark, dir, "day", Seq("id", "day"), empty)
    assert(stats == UpsertStats(0, 0, 0))
    assert(Seq(0, 1).map(d => fileState(s"$dir/day=$d")) == before)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("rejects duplicate source keys and keys without the partition column") {
    val dir = java.nio.file.Files.createTempDirectory("pm3").toString + "/t"
    Seq((1L, 0, "a")).toDF("id", "day", "v").write.partitionBy("day").parquet(dir)
    val dup = Seq((1L, 0, "x"), (1L, 0, "y")).toDF("id", "day", "v")
    assertThrows[IllegalArgumentException] {
      PartitionedMerge.upsert(spark, dir, "day", Seq("id", "day"), dup)
    }
    val ok = Seq((1L, 0, "x")).toDF("id", "day", "v")
    assertThrows[IllegalArgumentException] {
      PartitionedMerge.upsert(spark, dir, "day", Seq("id"), ok)
    }
  }
}
