package graft.ext

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The batched-inference harness contracts: positional zip-back,
  * batch-size invisibility, one init per task, bounded batches, NULL
  * routing — and the bundled Md5Scorer against a driver-side reference
  * (its cross-engine half is the q112 DuckDB oracle). */
object InferenceOpsSpec {
  val inits = new AtomicInteger(0)
  val batchSizes = new ConcurrentLinkedQueue[Integer]()

  class RecordingScorer extends InferenceOps.BatchScorer {
    override def init(): Unit = InferenceOpsSpec.inits.incrementAndGet()
    def scoreBatch(ids: Array[Long], texts: Array[String]): Array[Long] = {
      InferenceOpsSpec.batchSizes.add(ids.length)
      ids.map(_ * 10)
    }
  }
}

class InferenceOpsSpec extends AnyFunSuite with SparkTestBase {

  test("Md5Scorer equals the driver-side md5 reference") {
    val sql = spark
    import sql.implicits._
    val rows = Seq((0L, "key agg row"), (7L, "x"), (42L, ""))
    val got = InferenceOps.scoreBatched(rows.toDF("doc_id", "text"),
        new InferenceOps.Md5Scorer, batchSize = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { case (id, t) =>
      val hex = md.digest(s"m_$id:$t".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(got(id) == java.lang.Long.parseLong(hex.substring(0, 5), 16),
        s"doc $id")
    }
  }

  test("batch boundaries are invisible; NULLs route around the scorer") {
    val sql = spark
    import sql.implicits._
    val df = ((1L to 100L).map(i => (i, s"doc $i")) :+
      (999L, null.asInstanceOf[String])).toDF("doc_id", "text")
    def run(bs: Int) = InferenceOps.scoreBatched(df,
        new InferenceOps.Md5Scorer, batchSize = bs)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toSet
    val (a, b, c) = (run(1), run(7), run(1000))
    assert(a == b && b == c)
    assert(a.exists { case (id, s) => id == 999L && s == null })
    // modelFilter drops the NULL score (SQL comparison semantics):
    val kept = InferenceOps.modelFilter(df, new InferenceOps.Md5Scorer,
      tau = 1 << 20).collect() // tau = 16^5: keeps every scored row
    assert(kept.length == 100 && !kept.map(_.getLong(0)).contains(999L))
  }

  test("one init per non-empty task; batches bounded by batchSize") {
    val sql = spark
    import sql.implicits._
    InferenceOpsSpec.inits.set(0)
    InferenceOpsSpec.batchSizes.clear()
    val df = (1L to 50L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .repartition(3)
    InferenceOps.scoreBatched(df, new InferenceOpsSpec.RecordingScorer,
      batchSize = 8).collect()
    assert(InferenceOpsSpec.inits.get() == 3)
    val sizes = InferenceOpsSpec.batchSizes.toArray(Array.empty[Integer])
      .map(_.intValue).toSeq
    assert(sizes.forall(s => s >= 1 && s <= 8) && sizes.sum == 50)
  }
}
