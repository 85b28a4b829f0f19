package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Hand-computed snapshot diffs (q121's DuckDB oracle proves the
  * cross-engine half on orders). */
class DiffOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("classifies insert / delete / update; drops unchanged rows") {
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L))
      .toDF("k", "s", "v")
    val b = Seq((2L, "y", 20L), (3L, "z", 31L), (4L, "w", 40L))
      .toDF("k", "s", "v")
    val out = DiffOps.snapshotDiff(a, b, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    // key 2 unchanged → absent; 1 deleted, 3 updated, 4 inserted
    assert(out == Seq(1L -> "delete", 3L -> "update", 4L -> "insert"))
  }

  test("multi-column keys and separator-hostile payloads") {
    // adjacent payloads must not alias across the U+0001 separator:
    // ("ab","c") vs ("a","bc") are DIFFERENT payloads
    val a = Seq((1L, 1L, "ab", "c")).toDF("k1", "k2", "p", "q")
    val b = Seq((1L, 1L, "a", "bc")).toDF("k1", "k2", "p", "q")
    val out = DiffOps.snapshotDiff(a, b, Seq("k1", "k2"), Seq("p", "q"))
      .collect()
    assert(out.length == 1 && out(0).getString(2) == "update")
  }

  test("identical snapshots diff to empty, independent of partitioning") {
    val rows = (1L to 100L).map(i => (i, s"s$i", i * 7))
    val a = rows.toDF("k", "s", "v").repartition(7)
    val b = rows.toDF("k", "s", "v").repartition(3)
    assert(DiffOps.snapshotDiff(a, b, Seq("k"), Seq("s", "v")).count() == 0L)
  }

  test("shuffle moves (key, digest) only — no payload column survives the join") {
    val a = Seq((1L, "x", 10L)).toDF("k", "s", "v")
    val b = Seq((1L, "x", 11L)).toDF("k", "s", "v")
    val plan = DiffOps.snapshotDiff(a, b, Seq("k"), Seq("s", "v"))
      .queryExecution.optimizedPlan.toString
    // payload columns are digested below the join: the join itself must
    // not reference s or v
    val joinLine = plan.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(!joinLine.contains("s#") && !joinLine.contains("v#"), plan)
  }
}
