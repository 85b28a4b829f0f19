package graft.wrapper

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Tokenizer + `?`→`:PS_VAL_n` rewrite (reference query_wrapper.sql:305–324:
  * placeholders are located outside whitespace/comments/strings only). */
class SqlTokensSpec extends AnyFunSuite {

  test("rewrites each bare ? in textual order, 1-based") {
    val (sql, n) = SqlTokens.rewritePlaceholders(
      "INSERT INTO t (a, b, c) VALUES (?, ?, ?)")
    assert(n == 3)
    assert(sql == "INSERT INTO t (a, b, c) VALUES (:PS_VAL_1, :PS_VAL_2, :PS_VAL_3)")
  }

  test("? inside a string literal is not rewritten") {
    val (sql, n) = SqlTokens.rewritePlaceholders("SELECT '?', ? FROM t")
    assert(n == 1)
    assert(sql == "SELECT '?', :PS_VAL_1 FROM t")
  }

  test("? inside '' -escaped string stays put") {
    val (sql, n) = SqlTokens.rewritePlaceholders("SELECT 'it''s ?' , ?")
    assert(n == 1)
    assert(sql == "SELECT 'it''s ?' , :PS_VAL_1")
  }

  test("? inside -- and /* */ comments is not rewritten") {
    val (sql, n) = SqlTokens.rewritePlaceholders(
      "SELECT ? -- what? really?\n , /* ? */ ? FROM t")
    assert(n == 2)
    assert(sql == "SELECT :PS_VAL_1 -- what? really?\n , /* ? */ :PS_VAL_2 FROM t")
  }

  test("? inside quoted identifiers is not rewritten") {
    val (sql, n) = SqlTokens.rewritePlaceholders("SELECT \"a?b\", `c?d`, ? FROM t")
    assert(n == 1)
    assert(sql == "SELECT \"a?b\", `c?d`, :PS_VAL_1 FROM t")
  }

  test("no placeholders returns the input unchanged") {
    val in = "SELECT 1 FROM t WHERE x = 'a?b' -- ?"
    val (sql, n) = SqlTokens.rewritePlaceholders(in)
    assert(n == 0)
    assert(sql eq in)
  }

  // Property: build SQL from typed segments, so the expected placeholder
  // arity is known by construction; rewrite count must equal it and all
  // non-placeholder text must be preserved byte-for-byte in order.
  private val wordGen = Gen.alphaNumStr.map(s => " w" + s.take(8) + " ")
  private val litGen = Gen.alphaNumStr.map(s => "'" + s.take(6) + "?''x'")
  private val commentGen =
    Gen.oneOf(Gen.const("/* ? no */"), Gen.const("-- tail?\n"))
  private val phGen = Gen.const("?")

  private val segGen: Gen[(String, Int)] = Gen.oneOf(
    wordGen.map((_, 0)), litGen.map((_, 0)), commentGen.map((_, 0)),
    phGen.map((_, 1)))

  test("property: rewrite count == bare-? arity; other text preserved") {
    val prop = Prop.forAll(Gen.listOf(segGen)) { segs =>
      val sqlIn = segs.map(_._1).mkString
      val expected = segs.map(_._2).sum
      val (out, n) = SqlTokens.rewritePlaceholders(sqlIn)
      // Replacing the rewritten params back with ? must reproduce the input.
      n == expected && out.replaceAll(":PS_VAL_\\d+", "?") == sqlIn
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("unterminated strings/comments terminate at EOF without loss") {
    // Malformed SQL must never hang or drop text — tokens always
    // reassemble to the input (the error surfaces later, in the parser).
    Seq("SELECT 'unterminated", "SELECT /* open", "SELECT x -- trailing",
      "SELECT \"open ident", "'", "/*", "--", ":", "::").foreach { in =>
      val toks = SqlTokens.tokenize(in)
      assert(toks.map(_.text).mkString == in, s"lossy tokenize of: $in")
    }
    // A ? inside an unterminated literal still does not rewrite:
    val (out, n) = SqlTokens.rewritePlaceholders("SELECT ?, 'open ?")
    assert(n == 1 && out == "SELECT :PS_VAL_1, 'open ?")
  }

  test("tokenize classifies :v and ::i params, skipping literals") {
    val toks = SqlTokens.tokenize("SELECT :A, '::no', ::T.::S, b::c FROM x")
    val idents = toks.collect { case SqlTokens.Token(SqlTokens.IdentParam, t) => t }
    val values = toks.collect { case SqlTokens.Token(SqlTokens.ValueParam, t) => t }
    assert(idents == Vector("::T", "::S", "::c"))
    assert(values == Vector(":A"))
  }
}
