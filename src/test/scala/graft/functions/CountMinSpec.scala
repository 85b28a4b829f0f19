package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Count-Min sketch: the never-underestimates guarantee, the εN error
  * bound, merge ≡ single-pass, and null handling. */
class CountMinSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._
  import CountMin.{cmsEstimate, cmsSketch}

  private def estimates(df: org.apache.spark.sql.DataFrame,
      items: Seq[String], depth: Int = 4, width: Int = 512): Map[String, Long] = {
    val sk = df.agg(cmsSketch($"v", depth, width).as("sk"))
    items.toDF("item").crossJoin(broadcast(sk))
      .select($"item", cmsEstimate($"sk", $"item").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never underestimate and stay within the eps*N bound") {
    // zipfish counts: item i appears 1000/i times
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item_$i"))
    val df = rows.toDF("v")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = estimates(df, (1 to 50).map(i => s"item_$i"))
    val n = rows.size
    val eps = math.E / 512
    est.foreach { case (item, e) =>
      assert(e >= truth(item), s"$item underestimated: $e < ${truth(item)}")
      assert(e <= truth(item) + (eps * n * 4).toLong + 1,
        s"$item way over: $e vs ${truth(item)} (N=$n)")
    }
  }

  test("an item never inserted estimates at most eps*N, usually 0") {
    val df = (1 to 5000).map(i => s"present_$i").toDF("v")
    val e = estimates(df, Seq("absent"))("absent")
    assert(e <= (math.E / 512 * 5000 * 4).toLong + 1)
  }

  test("estimate is identical across partitionings (merge ≡ single pass)") {
    val rows = (1 to 3000).map(i => s"k${i % 97}")
    val probe = (0 until 97).map(i => s"k$i")
    val a = estimates(rows.toDF("v").repartition(1), probe)
    val b = estimates(rows.toDF("v").repartition(11), probe)
    assert(a == b)
  }

  test("NULL items are skipped") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("v")
    assert(estimates(df, Seq("a"))("a") == 2L)
  }

  test("grouped sketches stay independent") {
    val df = (1 to 400).map(i => (i % 2, s"g${i % 2}_item")).toDF("g", "v")
    val out = df.groupBy($"g").agg(cmsSketch($"v", 4, 128).as("sk"))
      .select($"g", cmsEstimate($"sk", concat(lit("g"), $"g", lit("_item")))
        .as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(0 -> 200L, 1 -> 200L))
  }

  test("bucket derivation matches the documented DuckDB-portable spelling") {
    // md5('cms_0_x') first 15 hex chars as unsigned, mod width — pinned
    // against a DuckDB run of the oracle expression.
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("cms_0_x".getBytes("UTF-8"))
    val hex = h.take(8).map(b => f"$b%02x").mkString
    val v = java.lang.Long.parseLong(hex.take(15), 16)
    assert(CmsAlgo.bucket(0, "x", 512) == (v % 512).toInt)
  }
}
