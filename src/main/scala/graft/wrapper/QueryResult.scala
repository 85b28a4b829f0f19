package graft.wrapper

import org.apache.spark.sql.{DataFrame, Row}

/** Error surface of a failed statement — the Spark analog of the reference's
  * `info.error_code` / `info.error_message` (query_wrapper.sql:42–43, 118). */
final case class QueryError(code: String, message: String)

/** Outcome of one wrapper-executed statement — the Spark analog of the Lua
  * `pquery` info table (reference query_wrapper.sql:40–59): statement text,
  * result rows, `rows_affected` for DML, error surface for failures.
  *
  * Scale note: unlike `pquery`, which always transfers the full result into
  * the script VM, materialization here is lazy — `resultCount` runs a
  * distributed count (no driver transfer) and `rows` collects only when the
  * caller actually reads them. A 100 TB result can pass through the wrapper
  * untouched as the underlying [[DataFrame]].
  */
final class QueryResult(
    val statementText: String,
    val dataFrame: Option[DataFrame],
    val rowsAffected: Option[Long],
    val error: Option[QueryError]) {

  def isSuccess: Boolean = error.isEmpty

  def errorMessage: String = error.map(_.message).getOrElse("")
  def errorCode: String = error.map(_.code).getOrElse("")

  /** Number of result rows (`#info` in the reference) — a distributed count,
    * computed at most once. Counts the *executed plan's* rows rather than
    * `df.count()` so every result expression is actually evaluated (plain
    * count() prunes projections, which would let runtime errors — CAST
    * failures, raise_error, ANSI overflow — escape the wrapper's error
    * path; `pquery` materializes eagerly and surfaces them, QW:41). Rows
    * stay on the executors. */
  lazy val resultCount: Long =
    dataFrame.map(_.queryExecution.toRdd.count()).getOrElse(0L)

  /** Fully materialized result rows (driver-side). Lazy: only collected when
    * read — iterators prefer [[localIterator]]. */
  lazy val rows: Array[Row] = dataFrame.map(_.collect()).getOrElse(Array.empty)

  /** Streaming row iterator (one partition at a time on the driver) — the
    * OOM-safe backing for `query_rows`/`query_values` (QW:337–408). */
  def localIterator: Iterator[Row] =
    dataFrame.map { df =>
      import scala.jdk.CollectionConverters._
      df.toLocalIterator().asScala
    }.getOrElse(Iterator.empty)

  /** Normalized rowcount, reference semantics (query_wrapper.sql:51–59):
    * `rows_affected` if present (DML); else the result row count; except a
    * 1×1 result whose statement text contains `'count'` (case-sensitive
    * substring, like Lua `string.find`) yields the cell value itself. */
  lazy val normalizedRowCount: Long = rowsAffected.getOrElse {
    val n = resultCount
    val oneByOne = n == 1 && dataFrame.exists(_.schema.length == 1)
    if (oneByOne && statementText.contains("count")) {
      rows.headOption.map(cellAsLong).getOrElse(n)
    } else n
  }

  private def cellAsLong(r: Row): Long = r.get(0) match {
    case null       => 0L
    case n: Number  => n.longValue()
    case other      => scala.util.Try(other.toString.trim.toLong).getOrElse(1L)
  }
}

object QueryResult {
  def success(statementText: String, df: DataFrame,
      rowsAffected: Option[Long] = None): QueryResult =
    new QueryResult(statementText, Some(df), rowsAffected, None)

  /** A statement with no result surface (COMMIT/ROLLBACK, DDL). */
  def empty(statementText: String): QueryResult =
    new QueryResult(statementText, None, None, None)

  def failure(statementText: String, error: QueryError): QueryResult =
    new QueryResult(statementText, None, None, Some(error))
}
