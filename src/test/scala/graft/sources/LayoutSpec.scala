package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Bucketed layout: a join between two tables bucketed on the join key
  * plans with NO shuffle exchange — the co-located-join contract. */
class LayoutSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("compact merges a small-file directory without changing the data") {
    val dir = java.nio.file.Files.createTempDirectory("cmp").toString + "/t"
    // 8 tiny files:
    (1L to 80L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(8).write.parquet(dir)
    val (before, after) = Layout.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(before == 8 && after == 1)
    val back = spark.read.parquet(dir).orderBy("id").collect()
    assert(back.length == 80 && back(0).getLong(0) == 1L && back(79).getLong(0) == 80L)
    // Already compact → no-op:
    assert(Layout.compact(spark, dir, targetFileBytes = 1L << 30) == ((1, 1)))
  }

  test("compactPartitioned merges files per hive partition, data intact") {
    val dir = java.nio.file.Files.createTempDirectory("cmpp").toString + "/t"
    (1L to 60L).map(i => (i, i % 3))
      .toDF("id", "day").repartition(6)
      .write.partitionBy("day").parquet(dir)
    val filesPer = (0 to 2).map(d =>
      new java.io.File(s"$dir/day=$d").listFiles()
        .count(_.getName.startsWith("part-")))
    assert(filesPer.forall(_ > 1), s"fixture not fragmented: $filesPer")

    val (before, after) = Layout.compactPartitioned(spark, dir, 1L << 30)
    assert(before == filesPer.sum && after == 3) // one file per partition
    val back = spark.read.parquet(dir)
    assert(back.count() == 60)
    // partition column still derived from the directory layout:
    assert(back.groupBy("day").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap == Map(0 -> 20L, 1 -> 20L, 2 -> 20L))
  }

  test("join of co-bucketed tables has no shuffle exchange") {
    val a = (1L to 200L).map(i => (i, s"a$i")).toDF("k", "av")
    val b = (1L to 200L).map(i => (i, i * 2.0)).toDF("k", "bv")
    Layout.writeBucketed(a, "bt_a", Seq("k"), numBuckets = 4, sortCols = Seq("k"))
    Layout.writeBucketed(b, "bt_b", Seq("k"), numBuckets = 4, sortCols = Seq("k"))
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force a sort-merge join so the bucket layout (not a broadcast)
      // is what eliminates the exchanges.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected bucket-local join, plan was:\n$plan")
      assert(joined.count() == 200)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.sql("DROP TABLE IF EXISTS bt_a")
      spark.sql("DROP TABLE IF EXISTS bt_b")
    }
  }
}
