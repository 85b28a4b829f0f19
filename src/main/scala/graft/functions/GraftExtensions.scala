package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, TimestampAdd, TimestampDiff}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native sketch expressions: registers
  * `minhash_signature(hashes, k)` and `simhash64(hashes)` so pass-through
  * SQL running via `QueryWrapper.query` / `spark.sql` can use them — the
  * reference's model is exactly "arbitrary SQL text reaches the engine"
  * (query_wrapper.sql:40), so engine extensions must be SQL-visible, not
  * Column-API-only.
  *
  * Two ways in:
  *   - production: `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (standard `SparkSessionExtensions` injection at session build)
  *   - live session (tests, notebooks): `GraftExtensions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got ${other.sql}")
  }

  private[functions] val functions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          s"minhash_signature(hashes, k) takes 2 arguments, got ${args.length}")
        MinHashSignature(args.head, intLit(args(1), "minhash_signature", 2))
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      { args: Seq[Expression] =>
        require(args.length == 1,
          s"simhash64(hashes) takes 1 argument, got ${args.length}")
        SimHash64(args.head)
      })) ++ dialectFunctions

  // ------------------------------------------------- Exasol dialect aliases
  //
  // Functions Exasol ETL SQL uses routinely that Spark spells differently —
  // registered as thin aliases (UnresolvedFunction delegation, so Spark's
  // own type coercion applies) so reference-dialect statements run through
  // `wrapper.query` unchanged. ADD_* return TIMESTAMP (Exasol preserves
  // DATE for date inputs; builders run pre-analysis and cannot see types).

  private def delegate(target: String)(args: Seq[Expression]): Expression =
    UnresolvedFunction(target, args, isDistinct = false)

  private def arity(fn: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n, s"$fn takes $n argument(s), got ${args.length}")
      b(args)
    }

  private def dialectEntry(name: String, n: Int)(
      b: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      arity(name, n)(b))

  // lazy: referenced from `functions` above during object init.
  private lazy val dialectFunctions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    dialectEntry("zeroifnull", 1)(a => delegate("coalesce")(Seq(a.head, Literal(0)))),
    dialectEntry("nullifzero", 1)(a => delegate("nullif")(Seq(a.head, Literal(0)))),
    dialectEntry("hash_md5", 1)(delegate("md5")),
    dialectEntry("hash_sha1", 1)(delegate("sha1")),
    dialectEntry("hash_sha256", 1)(a => delegate("sha2")(Seq(a.head, Literal(256)))),
    dialectEntry("edit_distance", 2)(delegate("levenshtein")),
    dialectEntry("add_days", 2)(a => TimestampAdd("DAY", a(1), a.head)),
    dialectEntry("add_hours", 2)(a => TimestampAdd("HOUR", a(1), a.head)),
    dialectEntry("add_minutes", 2)(a => TimestampAdd("MINUTE", a(1), a.head)),
    dialectEntry("add_seconds", 2)(a => TimestampAdd("SECOND", a(1), a.head)),
    dialectEntry("add_weeks", 2)(a => TimestampAdd("WEEK", a(1), a.head)),
    dialectEntry("add_years", 2)(a => TimestampAdd("YEAR", a(1), a.head)),
    dialectEntry("seconds_between", 2)(a =>
      TimestampDiff("SECOND", a(1), a.head)),
    dialectEntry("days_between", 2)(a =>
      TimestampDiff("DAY", a(1), a.head)))

  /** Register on an already-built session (the injection path above only
    * runs at session build). Skips if already registered — re-registration
    * is harmless but warns per function. */
  def register(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("simhash64"))
      functions.foreach { case (ident, info, builder) =>
        org.apache.spark.sql.graftbridge.Bridge.registerFunction(
          spark, ident, info, builder)
      }
}
