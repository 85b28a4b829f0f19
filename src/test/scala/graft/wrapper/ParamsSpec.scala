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
}
