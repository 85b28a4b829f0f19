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

  test("SATURATED sample path (size == k): sample is the bottom-k " +
      "ascending; theta/below/estimate helpers match kmv_distinct; " +
      "merge keeps the bottom-k") {
    import HashFunctions._
    val k = 16
    val vals = (1 to 200).map(i => s"sat_$i")
    // ground truth bottom-k of the md5-60 hashes
    val hashes = vals.map(HashFunctions.md5Hash60Local).distinct.sorted
    assert(hashes.length == 200) // no collisions in the fixture
    val expect = hashes.take(k)
    val df = vals.toDF("v").repartition(7) // saturation + a real merge
      .agg(kmvSample(md5Hash60($"v"), k).as("sk"))
      .withColumn("th", kmvTheta($"sk", k))
      .withColumn("nb", kmvBelow($"sk", $"th"))
      .withColumn("est", kmvEstimate("nb", "th"))
    val row = df.head()
    assert(row.getSeq[Long](0) == expect,
      "sample must be the k smallest distinct hashes, ascending")
    assert(row.getLong(1) == expect.last)   // θ = h_(k)
    assert(row.getLong(2) == (k - 1).toLong) // strictly-below count
    // the helper estimate must equal KmvDistinctAgg's (k−1)·2^60 div h_(k)
    val viaAgg = vals.toDF("v")
      .agg(kmvDistinct(md5Hash60($"v"), k)).head().getLong(0)
    assert(row.getLong(3) == viaAgg,
      "sample-side estimator must equal the aggregate's estimate")
    assert(viaAgg ==
      ((BigInt(k - 1) * BigInt(KmvDomain)) / BigInt(expect.last)).toLong)
  }

  test("SATURATED pairwise set ops: common-theta intersection/union " +
      "counts match a hand computation (the q162 shape above k)") {
    import HashFunctions._
    val k = 16
    val a = (1 to 120).map(i => s"pair_$i")          // 120 distinct
    val b = (61 to 200).map(i => s"pair_$i")         // 140 distinct, 60 shared
    val ha = a.map(HashFunctions.md5Hash60Local).sorted.take(k)
    val hb = b.map(HashFunctions.md5Hash60Local).sorted.take(k)
    val th = math.min(ha.last, hb.last)
    val expShared = ha.toSet.intersect(hb.toSet).count(_ < th).toLong
    val expUnion = (ha.toSet ++ hb.toSet).count(_ < th).toLong
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("s", "v")
      .groupBy($"s").agg(kmvSample(md5Hash60($"v"), k).as("sk"))
    val skA = df.filter($"s" === "a").head().getSeq[Long](1)
    val skB = df.filter($"s" === "b").head().getSeq[Long](1)
    assert(skA == ha && skB == hb)
    val pair = df.filter($"s" === "a").select($"sk".as("ska"))
      .crossJoin(df.filter($"s" === "b").select($"sk".as("skb")))
      .withColumn("th", least(kmvTheta($"ska", k), kmvTheta($"skb", k)))
      .select(
        kmvBelow(array_intersect($"ska", $"skb"), $"th").as("n_shared"),
        kmvBelow(array_union($"ska", $"skb"), $"th").as("n_union"))
      .head()
    assert(pair.getLong(0) == expShared && pair.getLong(1) == expUnion)
  }
}
