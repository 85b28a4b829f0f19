package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is `private[sql]`, so the
  * (standard Spark-extension) escape hatch is this shim living inside the
  * `org.apache.spark.sql` namespace — the same technique OSS Spark
  * libraries use to plug native expressions into the Column API. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Spark's internal bounded-priority-queue collect (`CollectTopK` is
    * `private[sql]`): one k-item heap per group, map-side combinable. */
  def collectTopK(c: Column, k: Int, reverse: Boolean): Column =
    column(org.apache.spark.sql.catalyst.expressions.aggregate
      .GraftCollectBridge.collectTopK(expression(c), k, reverse))

  /** Register a SQL function on a LIVE session (`sessionState` is
    * `private[sql]`; the public path, `SparkSessionExtensions`, only runs
    * at session build). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** Materialize a `SparkSessionExtensions`' injected functions into a
    * fresh registry and return their names — lets tests exercise the real
    * session-build injection path (`registerFunctions` is `private[sql]`). */
  def injectedFunctionNames(
      ext: org.apache.spark.sql.SparkSessionExtensions): Seq[String] = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }

  /** Drain the Spark listener bus (`listenerBus` is `private[spark]`) —
    * lets tests assert on job counts deterministically. */
  def waitForListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Storage location of a catalog table (`sessionState` is `private[sql]`).
    * Used by the DML emulation to stage checkpoints on the TABLE'S
    * filesystem rather than a driver-local temp dir. */
  def tableLocation(spark: org.apache.spark.sql.SparkSession,
      table: String): java.net.URI = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ident = cs.sessionState.sqlParser.parseTableIdentifier(table)
    cs.sessionState.catalog.getTableMetadata(ident).location
  }

  /** Partition column names of a catalog table (empty = unpartitioned).
    * Lets the DML emulation decide whether a statement can be served by a
    * touched-partition rewrite instead of a full-table one. */
  def partitionColumnNames(spark: org.apache.spark.sql.SparkSession,
      table: String): Seq[String] = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ident = cs.sessionState.sqlParser.parseTableIdentifier(table)
    cs.sessionState.catalog.getTableMetadata(ident).partitionColumnNames
  }
}
