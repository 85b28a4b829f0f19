package graft.wrapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compatibility execution for SQL the host engine supports but Spark's
  * parquet tables don't — currently `UPDATE t SET … [WHERE …]` (reference
  * B4, the `finish()` UPDATE pattern QW:168–175 generalized to user
  * tables).
  *
  * Semantics: standard SQL — every SET expression is evaluated against the
  * OLD row (so `SET a = b, b = a` swaps), WHERE gates the assignment
  * per-row. Execution is read → transform → checkpoint to a temp location →
  * overwrite, which is exactly how an immutable-storage warehouse applies
  * an UPDATE; rows_affected is the matched-row count. */
object SqlCompat {

  private val UpdateRe =
    "(?is)^\\s*update\\s+([\\w.`]+)\\s+set\\s+(.+?)(?:\\s+where\\s+(.+?))?\\s*;?\\s*$".r

  final case class Update(table: String, assignments: Seq[(String, String)],
      where: Option[String])

  /** Parse an UPDATE statement, or None if `sql` is not one. */
  def parseUpdate(sql: String): Option[Update] = sql match {
    case UpdateRe(table, setClause, whereClause) =>
      val assignments = splitTopLevel(setClause).map { a =>
        val i = a.indexOf('=')
        require(i > 0, s"malformed SET assignment: $a")
        (a.substring(0, i).trim, a.substring(i + 1).trim)
      }
      Some(Update(table, assignments, Option(whereClause).map(_.trim)))
    case _ => None
  }

  /** Split on top-level commas (outside strings/comments/parens). */
  private def splitTopLevel(s: String): Seq[String] = {
    val parts = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    SqlTokens.tokenize(s).foreach {
      case SqlTokens.Token(SqlTokens.Other, text) =>
        text.foreach {
          case '(' => depth += 1; cur += '('
          case ')' => depth -= 1; cur += ')'
          case ',' if depth == 0 => parts += cur.result(); cur.clear()
          case c => cur += c
        }
      case t => cur ++= t.text
    }
    parts += cur.result()
    parts.result().filter(_.trim.nonEmpty)
  }

  /** Execute a parsed UPDATE against a catalog table. Returns the matched
    * row count (`rows_affected`). */
  def runUpdate(spark: SparkSession, u: Update): Long = {
    val df = spark.table(u.table)
    val cond = u.where.map(expr).getOrElse(lit(true))
    val affected = df.filter(cond).count()

    val updated = df.select(df.columns.map { c =>
      u.assignments.find(_._1.equalsIgnoreCase(c)) match {
        case Some((_, e)) => when(cond, expr(e)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }.toSeq: _*)

    // Checkpoint through a temp location: the overwrite would otherwise
    // read from the files it is replacing.
    val tmp = java.nio.file.Files.createTempDirectory("qw_update").toString + "/data"
    updated.write.parquet(tmp)
    spark.read.schema(df.schema).parquet(tmp)
      .write.mode("overwrite").insertInto(u.table)
    affected
  }

  /** Whether the UPDATE target is a catalog table this path can serve. */
  def canHandle(spark: SparkSession, u: Update): Boolean =
    scala.util.Try(spark.catalog.tableExists(u.table)).getOrElse(false)
}
