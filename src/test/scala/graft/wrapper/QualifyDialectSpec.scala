package graft.wrapper

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** `QUALIFY` dialect (r9): the Snowflake/DuckDB window-filter clause as a
  * subquery rewrite inside `wrapper.query`'s translation chain. */
class QualifyDialectSpec extends AnyFunSuite with SparkTestBase {

  test("translateQualify: rewrite shape, tails, and rejections") {
    val got = SqlCompat.translateQualify(
      "SELECT k, v FROM t QUALIFY row_number() OVER (PARTITION BY k ORDER BY v) = 1 ORDER BY k").get
    assert(got ==
      "SELECT * EXCEPT (__graft_q) FROM (SELECT k, v, " +
        "(row_number() OVER (PARTITION BY k ORDER BY v) = 1) AS __graft_q " +
        "FROM t) WHERE __graft_q ORDER BY k")
    // LIMIT tail survives; no tail works; trailing semicolon dropped
    assert(SqlCompat.translateQualify(
      "SELECT a FROM t QUALIFY rank() OVER (ORDER BY a) <= 2 LIMIT 1").get
      .endsWith("WHERE __graft_q LIMIT 1"))
    assert(SqlCompat.translateQualify(
      "SELECT a FROM t QUALIFY rank() OVER (ORDER BY a) <= 2;").get
      .endsWith("WHERE __graft_q"))
    // ORDER BY inside the OVER () never cuts the predicate
    assert(SqlCompat.translateQualify(
      "SELECT a FROM t QUALIFY sum(a) OVER (ORDER BY a) > 5").get
      .contains("(sum(a) OVER (ORDER BY a) > 5) AS __graft_q"))
    // not translated: no QUALIFY, DISTINCT head, 'qualify' in a literal,
    // non-SELECT statements
    assert(SqlCompat.translateQualify("SELECT a FROM t").isEmpty)
    assert(SqlCompat.translateQualify(
      "SELECT DISTINCT a FROM t QUALIFY rank() OVER (ORDER BY a) = 1").isEmpty)
    assert(SqlCompat.translateQualify(
      "SELECT 'qualify me' AS a FROM t").isEmpty)
    assert(SqlCompat.translateQualify(
      "UPDATE t SET a = 1 -- qualify\n").isEmpty)
  }

  test("QUALIFY through the wrapper: per-group window filter, post-GROUP BY") {
    val sqlc = spark
    import sqlc.implicits._
    Seq(("a", 1, 10L), ("a", 2, 20L), ("a", 3, 5L), ("b", 4, 7L), ("b", 5, 9L))
      .toDF("grp", "id", "v").createOrReplaceTempView("qual_t")
    val w = QueryWrapper(spark)
    val (ok, res) = w.query(
      """SELECT grp, id, v FROM qual_t
        |QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v DESC, id) = 1
        |ORDER BY grp""".stripMargin)
    assert(ok, res.errorMessage)
    assert(res.dataFrame.get.collect().map(r =>
      (r.getString(0), r.getInt(1))).toSeq == Seq(("a", 2), ("b", 5)))
    // the canonical hard case: QUALIFY over a grouped aggregate
    val (ok2, res2) = w.query(
      """SELECT grp, sum(v) AS sv FROM qual_t GROUP BY grp
        |QUALIFY rank() OVER (ORDER BY sum(v) DESC) = 1""".stripMargin)
    assert(ok2, res2.errorMessage)
    assert(res2.dataFrame.get.collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 35L)))
  }
}
