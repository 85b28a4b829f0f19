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
    tableExists(spark, u.table)

  private def tableExists(spark: SparkSession, t: String): Boolean =
    scala.util.Try(spark.catalog.tableExists(t)).getOrElse(false)

  // ---------------------------------------------------------------- DELETE

  private val DeleteRe =
    "(?is)^\\s*delete\\s+from\\s+([\\w.`]+)(?:\\s+where\\s+(.+?))?\\s*;?\\s*$".r

  final case class Delete(table: String, where: Option[String])

  def parseDelete(sql: String): Option[Delete] = sql match {
    case DeleteRe(table, whereClause) =>
      Some(Delete(table, Option(whereClause).map(_.trim)))
    case _ => None
  }

  def canHandle(spark: SparkSession, d: Delete): Boolean =
    tableExists(spark, d.table)

  /** DELETE FROM t [WHERE p] on a parquet catalog table: keep the
    * complement, checkpoint, overwrite. Returns the deleted-row count. */
  def runDelete(spark: SparkSession, d: Delete): Long = {
    val df = spark.table(d.table)
    val cond = d.where.map(expr).getOrElse(lit(true))
    val affected = df.filter(cond).count()
    // Rows with a NULL predicate are NOT deleted (SQL semantics): keep
    // everything whose condition is not strictly TRUE.
    val remaining = df.filter(coalesce(!cond, lit(true)))
    val tmp = java.nio.file.Files.createTempDirectory("qw_delete").toString + "/data"
    remaining.write.parquet(tmp)
    spark.read.schema(df.schema).parquet(tmp)
      .write.mode("overwrite").insertInto(d.table)
    affected
  }

  // ---------------------------------------------------------------- B10:
  // Exasol/Oracle datetime format dialect → Spark (JDK DateTimeFormatter)
  // patterns. The reference's own SQL uses e.g.
  // TO_TIMESTAMP(?, 'YYYY-MM-DD HH24:MI:SS') (QW:98): 'YYYY' is week-year
  // in Spark (silently wrong) and 'HH24'/'MI' are invalid. The translator
  // rewrites format STRING LITERALS inside TO_TIMESTAMP/TO_DATE/TO_CHAR
  // calls only (token-aware, paren-depth tracked) and maps TO_CHAR to
  // date_format.

  private val formatTokenMap: Seq[(String, String)] = Seq(
    "YYYY" -> "yyyy", "YY" -> "yy",
    "HH24" -> "HH", "HH12" -> "hh",
    "MI" -> "mm", "SS" -> "ss",
    "MON" -> "MMM", "DAY" -> "EEEE", "DY" -> "E",
    "DD" -> "dd", "FF3" -> "SSS", "FF" -> "SSS",
    "AM" -> "a", "PM" -> "a")
  // NOTE: 'MM' (month) and 'HH' (12-hour in both dialects) need no entry;
  // HH24/HH12 are handled before a bare HH would match anything.

  private[wrapper] def translateFormatLiteral(lit: String): String = {
    // lit includes the surrounding quotes; translate the body token-wise,
    // longest token first, case-sensitive on the uppercase dialect tokens.
    val body = lit.substring(1, lit.length - 1)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      formatTokenMap.find { case (from, _) => body.startsWith(from, i) } match {
        case Some((from, to)) => sb ++= to; i += from.length
        case None => sb += body.charAt(i); i += 1
      }
    }
    "'" + sb.result() + "'"
  }

  private val ToFns = Set("to_timestamp", "to_date", "to_char")

  /** Rewrite Exasol-style datetime format literals (and `TO_CHAR` →
    * `date_format`) in a SQL text. Token-aware and call-aware: only string
    * literals lexically inside a TO_* argument list, and only from the
    * SECOND argument on (the format position — first-arg data literals are
    * never touched). */
  def translateDatetimeFormats(sql: String): String = {
    // (depth, commasSeen) per active TO_* call, innermost first.
    final case class Frame(depth: Int, var commas: Int)
    val out = new StringBuilder
    var frames = List.empty[Frame]
    var depth = 0
    var lastWord = ""        // most recent identifier word seen
    var lastWordStart = -1   // its start offset in `out`
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'

    SqlTokens.tokenize(sql).foreach {
      case SqlTokens.Token(SqlTokens.Other, text) =>
        var inWord = false
        text.foreach { c =>
          if (isWordChar(c)) {
            if (!inWord) { lastWordStart = out.length; lastWord = ""; inWord = true }
            lastWord += c
          } else {
            inWord = false
            c match {
              case '(' =>
                depth += 1
                if (ToFns.contains(lastWord.toLowerCase)) {
                  if (lastWord.equalsIgnoreCase("to_char"))
                    out.replace(lastWordStart, lastWordStart + lastWord.length,
                      "date_format")
                  frames ::= Frame(depth, 0)
                }
                lastWord = ""
              case ')' =>
                if (frames.headOption.exists(_.depth == depth)) frames = frames.tail
                depth -= 1
              case ',' =>
                frames.headOption.filter(_.depth == depth).foreach(_.commas += 1)
              case w if w.isWhitespace => () // word survives spaces before '('
              case _ => lastWord = ""
            }
          }
          out += c
        }
      case SqlTokens.Token(SqlTokens.Str, text)
          if frames.headOption.exists(_.commas >= 1) =>
        lastWord = ""
        out ++= translateFormatLiteral(text)
      case t =>
        lastWord = ""
        out ++= t.text
    }
    out.result()
  }
}
