package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Bottom-k KMV distinct sketch: exactness below k, accuracy above it,
  * merge = single-pass equivalence, determinism, null handling. */
class KmvSketchSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._
  import HashFunctions.{kmvDistinct, md5Hash60}

  test("below k distinct values the estimate is exact") {
    val df = (1 to 500).map(i => i % 200).toDF("v")
    val est = df.agg(kmvDistinct(md5Hash60($"v"), 1024)).head().getLong(0)
    assert(est == 200L)
  }

  test("above k the estimate lands within the 1/sqrt(k-2) error band ×3") {
    val n = 20000
    val df = (1 to n).toDF("v")
    val k = 256
    val est = df.agg(kmvDistinct(md5Hash60($"v"), k)).head().getLong(0)
    val tol = 3.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - n).toDouble / n < tol, s"est $est vs $n")
  }

  test("estimate is identical across partitionings (merge ≡ single pass)") {
    val base = (1 to 5000).map(i => s"key_$i")
    val a = base.toDF("v").repartition(1)
      .agg(kmvDistinct(md5Hash60($"v"), 128)).head().getLong(0)
    val b = base.toDF("v").repartition(13)
      .agg(kmvDistinct(md5Hash60($"v"), 128)).head().getLong(0)
    assert(a == b)
  }

  test("NULLs are skipped; all-NULL group estimates 0") {
    val df = Seq(Some("a"), None, Some("b"), None, Some("a"))
      .toDF("v")
    val est = df.agg(kmvDistinct(md5Hash60($"v"), 64)).head().getLong(0)
    assert(est == 2L)
    val empty = Seq[Option[String]](None, None).toDF("v")
    assert(empty.agg(kmvDistinct(md5Hash60($"v"), 64)).head().getLong(0) == 0L)
  }

  test("duplicates never crowd the heap: heavy-hitter input stays exact") {
    // one value repeated 10k times + 50 singletons: distinct = 51 < k
    val df = (Seq.fill(10000)("hot") ++ (1 to 50).map(_.toString)).toDF("v")
    val est = df.agg(kmvDistinct(md5Hash60($"v"), 256)).head().getLong(0)
    assert(est == 51L)
  }

  test("md5Hash60 matches the documented DuckDB-portable derivation") {
    // md5('hello') = 5d41402abc4b2a76...; first 15 hex chars as unsigned
    val got = Seq("hello").toDF("v")
      .select(md5Hash60($"v")).head().getLong(0)
    assert(got == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    assert(got == 419982666956583591L) // pinned against a DuckDB run
  }

  test("grouped aggregation keeps per-group sketches independent") {
    val df = (1 to 3000).map(i => (i % 3, s"v$i")).toDF("g", "v")
    val rows = df.groupBy($"g")
      .agg(kmvDistinct(md5Hash60($"v"), 2048).as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows == Map(0 -> 1000L, 1 -> 1000L, 2 -> 1000L))
  }
}
