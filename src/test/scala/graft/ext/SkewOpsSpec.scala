package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Hand-computed skew reports (q128's DuckDB oracle proves the
  * cross-engine half on events). */
class SkewOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def report(keys: Seq[Long], parts: Int = 4) =
    SkewOps.keySkewReport(keys.toDF("k").repartition(parts), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).head

  test("hand case: one hot key dominates") {
    // key 7 ×6, keys 1..4 ×1 → n=10, n_keys=5, max=6, top=7
    // multiplicity order (cnt, k): (1,1)(1,2)(1,3)(1,4)(6,7)
    // p50 rank = 4*50 div 100 + 1 = 3 → cnt 1
    // p99 rank = 4*99 div 100 + 1 = 4 → cnt 1
    // skew = 6*5/10 = 3.0 → 3_000_000 micro
    val keys = Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L, 4L)
    assert(report(keys) == ((10L, 5L, 6L, 7L, 1L, 1L, 3000000L)))
  }

  test("uniform keys report skew ratio 1.0, independent of partitioning") {
    val keys = (1L to 20L).flatMap(k => Seq.fill(3)(k))
    for (parts <- Seq(1, 7)) {
      val (n, nk, mx, _, p50, p99, skew) = report(keys, parts)
      assert((n, nk, mx, p50, p99, skew) ==
        ((60L, 20L, 3L, 3L, 3L, 1000000L)), s"parts=$parts")
    }
  }

  test("top key ties break to the largest key under the (cnt, key) order") {
    // keys 5 and 9 both ×2 → rank-n_keys row is key 9
    val keys = Seq(5L, 5L, 9L, 9L, 1L)
    assert(report(keys)._4 == 9L)
  }
}
