package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Jaro 1989, Winkler 1990) — the other classic
  * record-linkage comparator next to `levenshtein`/`soundex`/
  * [[ColognePhonetic]]: token-order-tolerant, prefix-boosted, in [0,1].
  * The reference's wrapper forwards fuzzy-match SQL to the host engine
  * (query_wrapper.sql:40); this completes that comparator family natively.
  *
  * Standard parameterization, matching DuckDB's
  * `jaro_winkler_similarity` so oracle rows can hash-compare exactly:
  * match window `max(|a|,|b|)/2 - 1`, transpositions halved, prefix
  * scale 0.1 over at most 4 chars, boost applied only when the Jaro
  * score exceeds 0.7. Comparison is over UTF-16 code units
  * (`String.charAt`): for BMP-only strings that is exactly code points
  * and hash-matches the DuckDB oracle (q154 compares over ASCII names);
  * a supplementary character counts as its two surrogate halves —
  * documented divergence from code-point JW, same spirit as the
  * empty-vs-empty convention below.
  */
object JaroWinklerAlgo {

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    // Empty-vs-empty is 0.0 (DuckDB's convention, so oracle rows
    // hash-compare; textbook JW says 1.0 — documented divergence).
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true
          tMatch(j) = true
          matches += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions / 2.0) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(n, m))
    while (prefix < maxPrefix && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` → double in [0,1]; codegen emits a direct static
  * call (no boxing, no UDF serialization), interpreted path via
  * `nullSafeEval`. */
final case class JaroWinklerSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two strings, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerAlgo.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}
