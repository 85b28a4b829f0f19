package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the sf1-derivation contract [[ScaleUp.derive]] relies on for the
  * cross-scale bench point: every copy is a self-contained star (FK
  * closure holds within a copy), key domains never collide across
  * copies, unscaled dims stay fixed, and payloads are perturbed so
  * dedup/similarity queries face realistic variation instead of exact
  * duplicate floods. */
class ScaleUpSpec extends AnyFunSuite with SparkTestBase {

  private val src = "/root/testdata/sf0.001"
  private val copies = 3

  private lazy val dst: String = {
    val d = Files.createTempDirectory("scaleup_spec").toString
    ScaleUp.derive(spark, src, d, copies)
    d
  }

  private def t(dir: String, name: String) =
    spark.read.parquet(s"$dir/$name.parquet")

  test("scaled tables multiply row counts; unscaled dims stay fixed") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(dst, n).count() === t(src, n).count() * copies, n)
    for (n <- Seq("region", "nation"))
      assert(t(dst, n).count() === t(src, n).count(), n)
  }

  test("key domains never collide across copies") {
    assert(t(dst, "customer").select("c_custkey").distinct().count()
      === t(src, "customer").select("c_custkey").distinct().count() * copies)
    assert(t(dst, "orders").select("o_orderkey").distinct().count()
      === t(src, "orders").select("o_orderkey").distinct().count() * copies)
  }

  test("FK closure survives the shift: no orphan rows in any copy") {
    val li = t(dst, "lineitem")
    val ord = t(dst, "orders")
    val cust = t(dst, "customer")
    val supp = t(dst, "supplier")
    assert(li.join(ord, col("l_orderkey") === col("o_orderkey"),
      "left_anti").count() === 0L, "lineitem->orders")
    assert(ord.join(cust, col("o_custkey") === col("c_custkey"),
      "left_anti").count() === 0L, "orders->customer")
    assert(li.join(supp, col("l_suppkey") === col("s_suppkey"),
      "left_anti").count() === 0L, "lineitem->supplier")
  }

  test("payloads are perturbed per copy, copy 0 is the original") {
    val docs = t(dst, "documents")
    // copy 0 = the untouched source rows (same ids, same text)
    val origTexts = t(src, "documents")
      .select(col("doc_id"), col("text").as("orig"))
    assert(docs.join(origTexts, "doc_id")
      .filter(col("text") =!= col("orig")).count() === 0L)
    // later copies carry distinct text (the "c<i> " prefix), so
    // cross-copy duplication adds NOTHING beyond the source's own
    // planted duplicates: per-text multiplicity is unchanged
    def maxMult(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("text")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxMult(docs) === maxMult(t(src, "documents")),
      "copies never stack duplicate texts")
    // names: suffixed beyond copy 0, so the distinct domain scales too
    assert(t(dst, "customer").select("c_name").distinct().count()
      === t(src, "customer").select("c_name").distinct().count() * copies)
  }

  test("event history extends instead of densifying") {
    import org.apache.spark.sql.Row
    val Row(srcMin: Any, srcMax: Any) =
      t(src, "events").selectExpr("min(ts)", "max(ts)").head()
    val Row(dstMin: Any, dstMax: Any) =
      t(dst, "events").selectExpr("min(ts)", "max(ts)").head()
    assert(srcMin === dstMin, "history starts at the same instant")
    assert(dstMax.toString > srcMax.toString, "history extends")
  }
}
