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

  test("z-ordered files carry narrow min/max ranges on BOTH columns") {
    import org.apache.spark.sql.functions._
    // 64×64 grid: x and y independent — a linear sort on x leaves every
    // file spanning the whole y domain.
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = rows.toDF("x", "y").repartition(7)
    val zdir = java.nio.file.Files.createTempDirectory("zord").toString + "/t"
    val ldir = java.nio.file.Files.createTempDirectory("lin").toString + "/t"
    Layout.writeZOrdered(df, Seq("x", "y"), zdir, nFiles = 16)
    df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y").write.parquet(ldir)

    def avgSpanPerFile(dir: String, c: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-")).map(_.toString)
      val spans = files.map { f =>
        val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).collect()(0)
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }
    // Data intact:
    assert(spark.read.parquet(zdir).count() == 64 * 64)
    assert(spark.read.parquet(zdir).agg(sum("x"), sum("y")).collect()(0)
      == df.agg(sum("x"), sum("y")).collect()(0))
    // Linear sort: x-files are narrow but y spans ~the full domain.
    assert(avgSpanPerFile(ldir, "y") > 50.0)
    // Z-order: BOTH dimensions' per-file spans stay bounded (ideal for 16
    // files on a 64×64 grid is a 16×16 tile; equi-depth splits that don't
    // align to tile boundaries can double a span — measured ~33 here vs
    // ~63 for the linear layout's trailing column).
    assert(avgSpanPerFile(zdir, "x") < 40.0,
      s"x span ${avgSpanPerFile(zdir, "x")}")
    assert(avgSpanPerFile(zdir, "y") < 40.0,
      s"y span ${avgSpanPerFile(zdir, "y")}")
  }
}
