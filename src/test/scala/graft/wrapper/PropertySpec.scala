package graft.wrapper

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The SURVEY §5.2-4 property suite: truncation bounds + idempotence,
  * identifier quote round-trip, sessionization order-invariance. */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("property: log truncation is length-bounded and idempotent") {
    val w = QueryWrapper(spark)
    val gen = Gen.chooseNum(0, 25000).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    check(Prop.forAll(gen, Gen.stringOfN(14, Gen.alphaUpperChar)) { (msg, lvl) =>
      w.log(lvl, msg)
      val m1 = w.messages.last
      val bounded = m1.message.length <= 20000 && m1.msgType.length <= 10
      // Idempotent: re-logging the truncated message leaves it unchanged.
      w.log(m1.msgType, m1.message)
      val m2 = w.messages.last
      bounded && m2.message == m1.message && m2.msgType == m1.msgType
    })
  }

  test("property: identifier quote round-trips through unquote") {
    def unquote(s: String): String =
      if (s.startsWith("`")) s.stripPrefix("`").stripSuffix("`").replace("``", "`")
      else s
    val ident = Gen.nonEmptyListOf(Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const(' ')), (1, Gen.const('`')),
      (1, Gen.const('.')))).map(_.mkString)
    check(Prop.forAll(ident) { s => unquote(Params.quote(s)) == s })
  }

  test("property: spliced identifiers appear verbatim in safe positions") {
    val safe = for {
      h <- Gen.alphaChar
      t <- Gen.listOf(Gen.alphaNumChar)
    } yield (h :: t).mkString
    check(Prop.forAll(safe) { name =>
      Params.spliceIdentifiers("SELECT * FROM ::T", Map("T" -> name)) ==
        s"SELECT * FROM $name"
    })
  }

  test("property: masked DML parsing never splits at keywords in literals") {
    // Random literal bodies (including clause keywords and quote escapes)
    // must come back verbatim in the parsed assignment / predicate.
    val body = Gen.listOf(Gen.frequency(
      (4, Gen.alphaNumChar.map(_.toString)),
      (1, Gen.const(" where ")), (1, Gen.const(" set ")),
      (1, Gen.const(" when matched ")), (1, Gen.const("''")),
      (1, Gen.const(" -- ")), (1, Gen.const("(")), (1, Gen.const(")"))))
      .map(_.mkString)
    check(Prop.forAll(body) { b =>
      val lit = s"'${b.replace("'", "''")}'"
      val u = SqlCompat.parseUpdate(s"UPDATE t SET a = $lit WHERE x = 1")
      val d = SqlCompat.parseDelete(s"DELETE FROM t WHERE note = $lit")
      u.exists(p => p.assignments == Seq(("a", lit)) &&
        p.where.contains("x = 1")) &&
        d.exists(_.where.contains(s"note = $lit"))
    })
  }

  test("sessionization is invariant under input partitioning/order") {
    val q24 = graft.queries.Queries.all.find(_.name == "q24_sessionize").get
    def rows(dir: String) = q24.fn(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val base = rows("/root/testdata/sf0.001")
    // Physically reshuffled copy of the events table (raw long-ns ts
    // column survives the round-trip; q24's reader converts either way):
    val dir = java.nio.file.Files.createTempDirectory("shuf").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartition(7)
      .write.parquet(s"$dir/events.parquet")
    assert(rows(dir) == base)
  }
}
