package graft.wrapper

import org.scalatest.funsuite.AnyFunSuite

/** Identifier splice semantics (reference README.md:43–57; VERDICT r1 fix:
  * splice must not fire inside string literals or comments). */
class ParamsSpec extends AnyFunSuite {

  test("splices ::NAME in identifier position") {
    assert(Params.spliceIdentifiers("SELECT * FROM ::TAB", Map("TAB" -> "events"))
      == "SELECT * FROM events")
  }

  test("two-part ::SCH.::TAB splice (README.md:46 pattern)") {
    assert(Params.spliceIdentifiers(
      "SELECT COUNT(*) FROM ::SCH.::TAB",
      Map("SCH" -> "etl", "TAB" -> "job_log"))
      == "SELECT COUNT(*) FROM etl.job_log")
  }

  test("lookup is case-insensitive (Exasol identifier semantics)") {
    assert(Params.spliceIdentifiers("SELECT * FROM ::tab", Map("TAB" -> "t1"))
      == "SELECT * FROM t1")
  }

  test("::x inside a string literal passes through unchanged") {
    val sql = "SELECT '::note' FROM t"
    assert(Params.spliceIdentifiers(sql, Map.empty) == sql)
  }

  test("::x inside comments passes through unchanged") {
    val sql = "SELECT 1 -- ::x\nFROM t /* ::y */"
    assert(Params.spliceIdentifiers(sql, Map.empty) == sql)
  }

  test("unknown identifier param raises") {
    val e = intercept[IllegalArgumentException] {
      Params.spliceIdentifiers("SELECT * FROM ::NOPE", Map("TAB" -> "t"))
    }
    assert(e.getMessage.contains("::NOPE"))
  }

  test("unsafe identifiers are backtick-quoted with escape") {
    assert(Params.quote("plain_name") == "plain_name")
    assert(Params.quote("has space") == "`has space`")
    assert(Params.quote("has`tick") == "`has``tick`")
    assert(Params.spliceIdentifiers("SELECT * FROM ::T", Map("T" -> "my table"))
      == "SELECT * FROM `my table`")
  }

  test("valueParamNames finds :x outside literals only") {
    assert(Params.valueParamNames("SELECT :A, ':B', ::C FROM t WHERE x = :D")
      == Set("A", "D"))
  }

  test("native IDENTIFIER(:p) clause works through wrapper.query (SURVEY §1.4)") {
    // Spark 4's IDENTIFIER() clause is the engine-native alternative to the
    // pre-parse ::x splice — a value param becomes an identifier inside the
    // parser, surviving nested-quoting edge cases the text splice can't.
    val spark = graft.SparkTestBase.spark
    spark.range(3).toDF("n").createOrReplaceTempView("ident_t")
    val w = QueryWrapper(spark)
    val (ok, res) = w.query(
      "SELECT count(*) AS c FROM IDENTIFIER(:tab)",
      QueryOptions(params = Some(Map("tab" -> "ident_t"))))
    assert(ok, res.errorMessage)
    assert(res.dataFrame.get.collect().head.getLong(0) == 3L)
  }

  test("nativeIdentifiers rewrites ::NAME to IDENTIFIER(:__graft_idN)") {
    val (sql, extra) = Params.nativeIdentifiers(
      "SELECT * FROM ::TAB WHERE x = :v", Map("TAB" -> "events", "v" -> 1))
    assert(sql == "SELECT * FROM IDENTIFIER(:__graft_id0) WHERE x = :v")
    assert(extra == Map("__graft_id0" -> "events"))
  }

  test("nativeIdentifiers fuses dotted ::SCH.::TAB runs into ONE clause") {
    val (sql, extra) = Params.nativeIdentifiers(
      "SELECT COUNT(*) FROM ::SCH.::TAB",
      Map("SCH" -> "etl", "TAB" -> "job log"))
    assert(sql == "SELECT COUNT(*) FROM IDENTIFIER(:__graft_id0)")
    // unsafe parts are backtick-quoted INSIDE the bound name — the parser
    // resolves the nesting, which is the point of the native clause
    assert(extra == Map("__graft_id0" -> "etl.`job log`"))
  }

  test("nativeIdentifiers keeps the text splice for mixed partial names") {
    val (sql1, extra1) = Params.nativeIdentifiers(
      "SELECT ::C FROM sch.::TAB", Map("C" -> "x", "TAB" -> "t"))
    assert(sql1 == "SELECT IDENTIFIER(:__graft_id0) FROM sch.t")
    assert(extra1 == Map("__graft_id0" -> "x"))
    val (sql2, extra2) = Params.nativeIdentifiers(
      "SELECT 1 FROM ::SCH.tab", Map("SCH" -> "s"))
    assert(sql2 == "SELECT 1 FROM s.tab")
    assert(extra2.isEmpty)
  }

  test("nativeIdentifiers leaves literals/comments untouched and raises on unbound") {
    val sql = "SELECT '::note' FROM t -- ::x"
    assert(Params.nativeIdentifiers(sql, Map.empty) == (sql, Map.empty))
    val e = intercept[IllegalArgumentException] {
      Params.nativeIdentifiers("SELECT * FROM ::NOPE", Map.empty)
    }
    assert(e.getMessage.contains("::NOPE"))
  }

  test("identifierBinding=native drives ::TAB through the parser end-to-end") {
    val spark = graft.SparkTestBase.spark
    spark.sql(
      "CREATE OR REPLACE TEMP VIEW `native id t` AS SELECT id AS n FROM RANGE(4)")
    val w = QueryWrapper(spark)
    w.identifierBinding = "native"
    // a name needing quoting: the splice would inline backticks; native
    // mode hands the quoted name to the parser as a bound constant
    val (ok, res) = w.query("SELECT count(*) AS c FROM ::T",
      QueryOptions(params = Some(Map("T" -> "native id t"))))
    assert(ok, res.errorMessage)
    assert(res.dataFrame.get.collect().head.getLong(0) == 4L)
  }
}
