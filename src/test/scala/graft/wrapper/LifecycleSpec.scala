package graft.wrapper

import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Golden lifecycle test — the PNG-equivalent (reference job_log.png /
  * job_details.png): a scripted job with an injected clock asserting exact
  * job_log and job_details contents, including logs-survive-rollback
  * ordering (QW:127–144) and the register→query→finish protocol. */
class LifecycleSpec extends AnyFunSuite with SparkTestBase {

  // Deterministic ticking clock: +1s per call, so row order is visible.
  private def tickingClock(): () => Instant = {
    var t = Instant.parse("2026-01-02T03:04:05Z")
    () => { val r = t; t = t.plusSeconds(1); r }
  }

  test("golden run: register → count → custom level → finish") {
    val dir = Files.createTempDirectory("golden").toString
    val clock = tickingClock()
    val store = new LogStore(spark, dir, clock)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("li_gold")

    val w = QueryWrapper(spark, Some(store), "golden_job", clock)
    w.query("SELECT count(*) FROM li_gold")
    w.log("MY_LOG", "Starting customer load") // README.md:59 custom level
    w.finish()

    // job_log: one run, closed successfully, times from the injected clock.
    val jl = store.jobLog.collect()
    assert(jl.length == 1)
    val run = jl(0)
    assert(run.getLong(0) == 1L)
    assert(run.getString(1) == "golden_job")
    assert(run.getString(2) == "FINISHED SUCCESSFULLY")
    assert(run.getTimestamp(3) != null && run.getTimestamp(4) != null)
    assert(!run.getTimestamp(4).before(run.getTimestamp(3)))

    // job_details: exact sequence (detail_id, level, message, rowcount).
    val jd = store.jobDetails.orderBy("detail_id").collect().map(r =>
      (r.getLong(0), r.getString(3), r.getString(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(jd(0) == ((1L, "INFO", "Job nr. 1 registered", -1L)))
    assert(jd(1) == ((2L, "INFO", "SELECT count(*) FROM li_gold", 6000L)))
    assert(jd(2) == ((3L, "MY_LOG", "Starting customer load", -1L)))
    assert(jd(3) == ((4L, "INFO", "commit -- wrapper", 0L)))
    assert(jd.length == 4)
    assert(jd.forall(_._1 > 0))

    // All detail rows carry the run id.
    assert(store.jobDetails.collect().forall(_.getLong(1) == 1L))
  }

  test("job_details.log_time is UTC-consistent with job_log on non-UTC JVMs") {
    val prevTz = java.util.TimeZone.getDefault
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
    try {
      val dir = Files.createTempDirectory("tz").toString
      val t0 = Instant.parse("2026-01-02T03:04:05Z")
      val store = new LogStore(spark, dir, () => t0)
      // msgTime strings are formatted in UTC by QueryWrapper; parsing them
      // back must use UTC too, not the JVM default zone.
      store.appendDetails(Seq(
        LogMessage(Some(1L), "2026-01-02 03:04:05", "INFO", "tz probe", None)))
      val logged = store.jobDetails.collect()(0).getTimestamp(2)
      assert(logged.getTime == t0.toEpochMilli,
        s"log_time ${logged.getTime} != instant ${t0.toEpochMilli} — " +
          "msgTime was parsed in the JVM default zone")
    } finally java.util.TimeZone.setDefault(prevTz)
  }

  test("run ids are sequential across jobs (INSERT-then-MAX, QW:255-274)") {
    val dir = Files.createTempDirectory("seq").toString
    val clock = tickingClock()
    val store = new LogStore(spark, dir, clock)
    val w1 = QueryWrapper(spark, Some(store), "job_a", clock)
    val w2 = QueryWrapper(spark, Some(store), "job_b", clock)
    assert(w1.runId.contains(1L))
    assert(w2.runId.contains(2L))
    w1.finish(); w2.finish()
    val statuses = store.jobLog.orderBy("run_id").collect().map(_.getString(2))
    assert(statuses.toSeq == Seq("FINISHED SUCCESSFULLY", "FINISHED SUCCESSFULLY"))
  }

  test("logs survive rollback (QW:127-144 ordering)") {
    val dir = Files.createTempDirectory("rb").toString
    val clock = tickingClock()
    val store = new LogStore(spark, dir, clock)
    val w = QueryWrapper(spark, Some(store), "rb_job", clock)
    w.log("INFO", "work before rollback")
    w.rollback()
    val msgs = store.jobDetails.orderBy("detail_id").collect().map(_.getString(4))
    assert(msgs.contains("work before rollback"))
    assert(msgs.contains("rollback -- wrapper"))
  }

  test("finish(rollback=true) still closes the run and persists logs") {
    val dir = Files.createTempDirectory("fin_rb").toString
    val clock = tickingClock()
    val store = new LogStore(spark, dir, clock)
    val w = QueryWrapper(spark, Some(store), "fin_rb_job", clock)
    w.log("INFO", "partial work")
    val messages = w.finish(rollback = true)
    assert(store.jobLog.collect()(0).getString(2) == "FINISHED SUCCESSFULLY")
    // finish returns the messages with the QW:414 schema shape:
    assert(messages.columns.toSeq ==
      Seq("run_id", "msg_time", "msg_type", "message", "rowcount"))
    assert(messages.count() >= 2)
  }

  test("in-memory mode (no log store): logging works, nothing persists") {
    val w = QueryWrapper(spark, None, "mem_job")
    assert(w.runId.isEmpty)
    w.log("INFO", "ephemeral")
    val df = w.finish()
    assert(df.filter(df("message") === "ephemeral").count() == 1)
    // run_id column is null throughout (QW:161 nil path):
    assert(df.filter(df("run_id").isNotNull).count() == 0)
  }

  test("README end-to-end job transposed to testdata (RM:39-66)") {
    val dir = Files.createTempDirectory("readme").toString
    val clock = tickingClock()
    val store = new LogStore(spark, dir, clock)
    Seq("region", "nation", "customer").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .createOrReplaceTempView(s"readme_$t")
    }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    spark.createDataFrame(Seq(
      org.apache.spark.sql.Row("readme_region"),
      org.apache.spark.sql.Row("readme_nation"),
      org.apache.spark.sql.Row("readme_customer")).asJava,
      StructType(Seq(StructField("table_name", StringType))))
      .createOrReplaceTempView("readme_cat")

    val w = QueryWrapper(spark, Some(store), "readme_job", clock)
    // The README main loop: iterate a catalog result, count each table with
    // a ::TAB identifier splice (RM:41-46).
    var total = 0L
    for (Seq(tab) <- w.queryValues("SELECT table_name FROM readme_cat ORDER BY table_name")) {
      w.setParam("TAB", tab)
      val (_, res) = w.query("SELECT count(*) FROM ::TAB")
      total += res.normalizedRowCount
    }
    w.log("MY_LOG", s"counted $total rows total")
    w.finish()

    assert(total == (5 + 25 + 150)) // sf0.001 region+nation+customer
    val jl = store.jobLog.collect()
    assert(jl(0).getString(2) == "FINISHED SUCCESSFULLY")
    val msgs = store.jobDetails.orderBy("detail_id").collect()
    val counts = msgs.filter(r => r.getString(4).startsWith("SELECT count(*) FROM readme_"))
    assert(counts.length == 3)
    // Auto-logged statements carry the spliced table name + its rowcount
    // (the job_details.png shape: statement text, rowcount column):
    assert(counts.map(r => r.getLong(5)).sorted.toSeq == Seq(5L, 25L, 150L))
    assert(msgs.exists(_.getString(4) == "counted 180 rows total"))
  }

  test("close() on a LARGE job_log updates exactly the target run without " +
      "a driver collect (r11: distributed runId-conditional rewrite)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("large_log").toString
    val clock: () => java.time.Instant =
      () => java.time.Instant.parse("2026-03-04T05:06:07Z")
    val store = new LogStore(spark, dir, clock)
    // Seed a years-of-history-sized job_log directly (register() would
    // append one file per run); run_ids 1..10000, all RUNNING.
    val t0 = Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    spark.range(1, 10001)
      .select(col("id").as("run_id"), lit("old_job").as("script_name"),
        lit("RUNNING").as("status"), lit(t0).as("start_time"),
        lit(null).cast("timestamp").as("end_time"))
      .write.mode("overwrite").parquet(store.jobLogPath)
    store.close(4711L, "FINISHED SUCCESSFULLY")
    val after = store.jobLog.cache()
    assert(after.count() == 10000L)
    val hit = after.filter(col("run_id") === 4711L).head()
    assert(hit.getString(2) == "FINISHED SUCCESSFULLY")
    assert(hit.getTimestamp(4) == Timestamp.from(clock()))
    // every other row untouched (status AND end_time)
    assert(after.filter(col("run_id") =!= 4711L)
      .filter(col("status") =!= "RUNNING" || col("end_time").isNotNull)
      .count() == 0L)
    after.unpersist()
  }
}
