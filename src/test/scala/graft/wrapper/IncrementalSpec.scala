package graft.wrapper

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** High-watermark incremental loads: only-new-rows delta, watermark
  * advancement via MERGE, no-op when nothing is new, replay-safe ordering. */
class IncrementalSpec extends AnyFunSuite with SparkTestBase {

  test("increments load only new rows and advance the watermark") {
    val loc = Files.createTempDirectory("inc").toString
    spark.sql(s"CREATE TABLE inc_src (id BIGINT, ts TIMESTAMP) USING parquet LOCATION '$loc/src'")
    spark.sql(s"CREATE TABLE inc_tgt (id BIGINT, ts TIMESTAMP) USING parquet LOCATION '$loc/tgt'")
    val state = "inc_state"
    spark.sql(s"DROP TABLE IF EXISTS $state")
    try {
      val w = QueryWrapper(spark)
      spark.sql(
        "INSERT INTO inc_src VALUES (1, timestamp'2026-01-01 00:00:01'), " +
          "(2, timestamp'2026-01-01 00:00:02')")

      val n1 = Incremental.loadIncrement(
        w, state, "job_a", spark.table("inc_src"), "ts", "inc_tgt")
      assert(n1 == 2L)
      assert(spark.table("inc_tgt").count() == 2L)

      // Nothing new → no-op, target unchanged:
      val n2 = Incremental.loadIncrement(
        w, state, "job_a", spark.table("inc_src"), "ts", "inc_tgt")
      assert(n2 == 0L)
      assert(spark.table("inc_tgt").count() == 2L)

      // New rows arrive; ONLY they move (no re-append of 1 and 2):
      spark.sql(
        "INSERT INTO inc_src VALUES (3, timestamp'2026-01-01 00:00:03')")
      val n3 = Incremental.loadIncrement(
        w, state, "job_a", spark.table("inc_src"), "ts", "inc_tgt")
      assert(n3 == 1L)
      val ids = spark.table("inc_tgt").orderBy("id").collect().map(_.getLong(0))
      assert(ids.toSeq == Seq(1L, 2L, 3L))

      // Watermark state is the name/value parameter-table shape:
      assert(Incremental.currentWatermark(w, state, "job_a")
        .startsWith("2026-01-01 00:00:03"))
      // Independent jobs keep independent watermarks:
      assert(Incremental.currentWatermark(w, state, "job_b")
        .startsWith("1970-01-01"))

      // Every step went through the wrapper's logged surface:
      assert(w.messages.exists(_.message.contains("appended rows")))
    } finally {
      Seq("inc_src", "inc_tgt", state).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("datePartitionCol bound reaches the scan as a partition filter") {
    val loc = Files.createTempDirectory("inc3").toString
    import graft.SparkTestBase.spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-02 10:00:00")),
      (3L, java.sql.Timestamp.valueOf("2026-01-03 10:00:00")))
      .toDF("id", "ts").withColumn("day", to_date($"ts"))
      .write.partitionBy("day").parquet(s"$loc/src")
    spark.sql(s"CREATE TABLE inc3_tgt (id BIGINT, ts TIMESTAMP, day DATE) USING parquet LOCATION '$loc/tgt'")
    spark.sql("DROP TABLE IF EXISTS inc3_state")
    try {
      val w = QueryWrapper(spark)
      val src = spark.read.parquet(s"$loc/src")
      // Seed the watermark by loading everything once:
      Incremental.loadIncrement(w, "inc3_state", "job_p", src, "ts", "inc3_tgt",
        datePartitionCol = Some("day"))
      // The next delta's PLAN must prune on the day partition:
      val wm = Incremental.currentWatermark(w, "inc3_state", "job_p")
      val delta = src
        .filter($"ts" > to_timestamp(lit(wm), Incremental.WatermarkFmt))
        .filter($"day" >= to_date(to_timestamp(lit(wm), Incremental.WatermarkFmt)))
      val plan = delta.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") &&
        plan.contains("day"), s"no day partition filter in:\n$plan")
      // And a second increment is a no-op with correct counts:
      assert(Incremental.loadIncrement(w, "inc3_state", "job_p", src, "ts",
        "inc3_tgt", datePartitionCol = Some("day")) == 0L)
      assert(spark.table("inc3_tgt").count() == 3L)
    } finally {
      Seq("inc3_tgt", "inc3_state").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("transform applies to the delta before the append") {
    val loc = Files.createTempDirectory("inc2").toString
    spark.sql(s"CREATE TABLE inc2_src (id BIGINT, ts TIMESTAMP) USING parquet LOCATION '$loc/src'")
    spark.sql(s"CREATE TABLE inc2_tgt (id BIGINT, ts TIMESTAMP) USING parquet LOCATION '$loc/tgt'")
    spark.sql("DROP TABLE IF EXISTS inc2_state")
    try {
      val w = QueryWrapper(spark)
      spark.sql("INSERT INTO inc2_src VALUES (1, timestamp'2026-01-01 00:00:01')")
      import org.apache.spark.sql.functions.col
      Incremental.loadIncrement(
        w, "inc2_state", "job_t", spark.table("inc2_src"), "ts", "inc2_tgt",
        transform = _.withColumn("id", col("id") * 10))
      assert(spark.table("inc2_tgt").head().getLong(0) == 10L)
    } finally {
      Seq("inc2_src", "inc2_tgt", "inc2_state").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
