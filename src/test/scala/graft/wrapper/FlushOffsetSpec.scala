package graft.wrapper

import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Offset-resumable flush semantics (QW:87–94, 116): repeated commits write
  * only messages buffered since the previous flush — no duplicates, no
  * gaps. */
class FlushOffsetSpec extends AnyFunSuite with SparkTestBase {

  test("repeated commits flush incrementally without duplicates") {
    val dir = Files.createTempDirectory("offset").toString
    val clock = () => Instant.parse("2026-01-02T03:04:05Z")
    val store = new LogStore(spark, dir, clock)
    val w = QueryWrapper(spark, Some(store), "offset_job", clock)

    w.log("INFO", "first")
    w.commit()
    val afterFirst = store.jobDetails.count()

    w.log("INFO", "second")
    w.commit()
    val all = store.jobDetails.orderBy("detail_id").collect()

    val messages = all.map(_.getString(4)).toSeq
    // Each message exactly once, in buffer order:
    assert(messages.count(_ == "first") == 1)
    assert(messages.count(_ == "second") == 1)
    assert(messages.indexOf("first") < messages.indexOf("second"))
    // Second flush added exactly: "second" + its own commit marker.
    assert(all.length == afterFirst + 2)
    // detail_ids are dense and strictly increasing:
    assert(all.map(_.getLong(0)).toSeq == (1L to all.length).toSeq)
  }

  test("commit with nothing new writes only its own marker") {
    val dir = Files.createTempDirectory("offset2").toString
    val store = new LogStore(spark, dir)
    val w = QueryWrapper(spark, Some(store), "noop_job")
    val before = store.jobDetails.count()
    w.commit(logging = false) // marker not logged, nothing buffered
    assert(store.jobDetails.count() == before)
  }
}
