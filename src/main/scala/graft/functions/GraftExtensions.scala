package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
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
      }))

  /** Register on an already-built session (the injection path above only
    * runs at session build). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(
        spark, ident, info, builder)
    }
}
