package graft.wrapper

import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The B16 script harness: named steps through the run protocol, finish at
  * the end, messages table returned — the EXECUTE SCRIPT analog. */
class EtlJobSpec extends AnyFunSuite with SparkTestBase {

  private val clock: () => Instant = () => Instant.parse("2026-01-02T03:04:05Z")

  test("execute runs steps in order with the run protocol and finishes") {
    val dir = Files.createTempDirectory("job").toString
    val store = new LogStore(spark, dir, clock)
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .createOrReplaceTempView("job_region")
    val messages = EtlJob.execute(spark, Some(store), "etl_job", Seq(
      "count_regions" -> (w => w.query("SELECT count(*) FROM job_region")),
      "note" -> (w => w.log("MY_LOG", "step two done"))),
      clock = clock)
    val levels = store.jobDetails.orderBy("detail_id").collect()
      .map(r => (r.getString(3), r.getString(4)))
    assert(levels.exists(_ == ("START", "Entering function count_regions")))
    assert(levels.exists(_ == ("INFO", "Finished function count_regions")))
    assert(levels.exists(_ == ("START", "Entering function note")))
    assert(levels.exists(_ == ("MY_LOG", "step two done")))
    assert(store.jobLog.collect()(0).getString(2) == "FINISHED SUCCESSFULLY")
    assert(messages.count() >= 6)
  }

  test("a failing step closes the job WITH ERROR and rethrows") {
    val dir = Files.createTempDirectory("job_err").toString
    val store = new LogStore(spark, dir, clock)
    intercept[RuntimeException] {
      EtlJob.execute(spark, Some(store), "bad_job", Seq(
        "boom" -> (_ => throw new RuntimeException("step failed"))),
        clock = clock)
    }
    assert(store.jobLog.collect()(0).getString(2) == "FINISHED WITH ERROR")
    val msgs = store.jobDetails.collect().map(_.getString(4))
    assert(msgs.exists(_.contains("boom returned with error: step failed")))
  }
}
