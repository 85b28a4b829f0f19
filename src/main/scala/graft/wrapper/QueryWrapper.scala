package graft.wrapper

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import scala.collection.mutable
import scala.util.{Failure, Success, Try}
import scala.util.control.NonFatal

import org.apache.spark.SparkThrowable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Per-query options (the reference's `options` table, query_wrapper.sql:39):
  * `logging` opts a statement out of auto-logging; `params` overrides the
  * wrapper's shared parameter map for this statement only (QW:40). */
final case class QueryOptions(
    logging: Boolean = true,
    params: Option[Map[String, Any]] = None)

/** Raised by the wrapper's abort path (QW:44–48) and by `run` on undefined
  * functions (QW:241). */
final class QueryWrapperException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Row facade giving the reference's dual field access: by name and by
  * 1-based index (QW:356–361 `data.TABLE_NAME .. data[2]`). */
final case class ResultRow(row: Row) {
  def apply(i: Int): Any = row.get(i - 1)
  def apply(name: String): Any = row.getAs[Any](name)
  def isNull(i: Int): Boolean = row.isNullAt(i - 1)
}

/** The Query Wrapper — a Spark-native re-expression of exasol/etl-utils'
  * `query_wrapper.sql` (459-line Lua library): uniform parameterized query
  * execution with error policy, structured job logging into
  * `job_log`/`job_details`, parameter management, prepared statements,
  * result iterators and procedural composition.
  *
  * Where the original delegates every query to the host engine via `pquery`
  * (QW:40), this delegates to `spark.sql(text, args)` — parse, optimize and
  * distributed execution belong to Catalyst/Tungsten; the wrapper adds the
  * lifecycle around it.
  *
  * Divergences from the Lua original, all deliberate:
  *   - `trim` on log messages is a plain trim (the original's Lua pattern
  *     returns nil for strings shorter than 3 non-space chars, QW:32–36 — an
  *     accident of the pattern, not intent).
  *   - Spark writes are auto-committed; `commit`/`rollback` keep their
  *     observable role as log-flush points (QW:127–144), with the reference's
  *     ordering guarantee that logs survive a rollback.
  *   - A failure *during* `finish` does not recurse into `finish` again
  *     (the original would, QW:44–48 × QW:168–183).
  */
final class QueryWrapper private (
    val spark: SparkSession,
    val logStore: Option[LogStore],
    val scriptName: String,
    clock: () => Instant) {

  /** Durable script/connection catalog beside the job log (VERDICT r11
    * #3): a LogStore-backed wrapper persists DDL-created objects to
    * `<root>/scripts` + `<root>/connections` and rehydrates them in
    * [[init]]; in-memory wrappers stay session-scoped (QW:448's
    * nothing-persists mode). */
  private val durableCatalog: Option[DurableCatalog] =
    logStore.map(ls => new DurableCatalog(spark, ls.rootDir, clock))

  /** `verbosity` (QW:416): ≥3 logs DEBUG per statement, 2 logs INFO, <2 off. */
  var verbosity: Int = 2
  /** `on_error` (QW:417): abort (no rollback) | rollback | continue. */
  var onError: String = "abort"
  /** `::NAME` identifier-parameter binding mode: "splice" (default —
    * pre-parse text splice, required when the statement is handled by a
    * dialect emulation layer whose parser must see the final name) or
    * "native" (Spark ≥4 `IDENTIFIER()` clause — quoting and nesting edge
    * cases resolve in the SQL parser, [[Params.nativeIdentifiers]]). */
  var identifierBinding: String = "splice"
  var errors: Int = 0
  var runId: Option[Long] = None

  /** Schema string of the `finish()` return value, reference parity (QW:414). */
  val messagesTypes: String =
    "run_id INT, msg_time VARCHAR2(20), msg_type VARCHAR(10), message VARCHAR(20000), rowcount DECIMAL(18)"

  private[wrapper] val messages = mutable.ArrayBuffer.empty[LogMessage]
  private val queryParams = mutable.LinkedHashMap.empty[String, Any]
  private var messageLogOffset = 0
  private var finishing = false
  private[wrapper] var startingSchema: Option[String] = None

  private val timeFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  // ------------------------------------------------------------------ A1/A5

  /** Single SQL-null notion on the Spark side (reference `is_null`, QW:24–30,
    * papers over two Lua null flavors). */
  def isNull(x: Any): Boolean = x == null || x == None

  /** Append a message to the in-memory buffer (QW:70–85). Truncation rules
    * are the reference's observable constants: level >10 chars → first 7 +
    * `...`; message >20000 chars → first 19995 + `...`. ERROR increments the
    * error counter that decides the final job status. */
  def log(msgType: String, text: String, rowcount: Option[Long] = None): Unit = {
    val mt =
      if (msgType.length > 10) msgType.substring(0, 7) + "..." else msgType
    var msg = Option(text).map(_.trim).getOrElse("")
    if (msg.length > 20000) msg = msg.substring(0, 19995) + "..."
    messages += LogMessage(runId, timeFmt.format(clock()), mt, msg, rowcount)
    if (mt == "ERROR") errors += 1
  }

  // ------------------------------------------------------------------ A3/A4

  private val TxRe = "(?is)^\\s*(commit|rollback)\\b.*".r
  private val OpenSchemaRe = "(?is)^\\s*open\\s+schema\\s+(\\S+)\\s*$".r

  /** THE pass-through (reference `wrap_query`, QW:38–68): splice `::x`
    * identifier params, bind `:x` value params, execute via `spark.sql`;
    * on failure log INFO(statement) + ERROR(message) and apply the
    * `on_error` policy (abort/rollback finish first, then raise — QW:44–48);
    * on success auto-log at verbosity ≥2 with the normalized rowcount. */
  def query(sqlText: String,
      options: QueryOptions = QueryOptions()): (Boolean, QueryResult) = {
    val params = options.params.getOrElse(queryParams.toMap)
    var stmtText = sqlText
    Try {
      // Script DDL is handled BEFORE param splicing: a CREATE SCRIPT
      // body's `:P`/`::P` references belong to the script's own EXECUTE-
      // time binding, not to this wrapper's current params (an unbound
      // `::P` would otherwise raise at CREATE, and a bound one would
      // freeze today's value into the body).
      if (SqlCompat.handleScriptDdl(sqlText, durableCatalog))
        QueryResult.empty(sqlText)
      else if (identifierBinding == "native") {
        val (rewritten, extra) = Params.nativeIdentifiers(sqlText, params)
        stmtText = rewritten
        execute(stmtText, params ++ extra)
      } else {
        stmtText = Params.spliceIdentifiers(sqlText, params)
        execute(stmtText, params)
      }
    } match {
      case Success(res) =>
        if (options.logging) {
          if (verbosity >= 3) log("DEBUG", stmtText, Some(res.normalizedRowCount))
          else if (verbosity == 2) log("INFO", stmtText, Some(res.normalizedRowCount))
        }
        (true, res)
      case Failure(e) =>
        val err = toError(e)
        log("INFO", stmtText)
        log("ERROR", err.message)
        if (!finishing && (onError == "abort" || onError == "rollback")) {
          finish(rollback = onError == "rollback")
          throw new QueryWrapperException(
            err.message + "\n Statement was: " + stmtText + "\n", e)
        }
        (false, QueryResult.failure(stmtText, err))
    }
  }

  private def execute(stmt: String, params: Map[String, Any]): QueryResult =
    stmt match {
      case TxRe(_) =>
        // B9: transaction markers are wrapper-level (Spark writes are
        // auto-committed); accepted syntactically, logged with rowcount 0.
        QueryResult.empty(stmt)
      case OpenSchemaRe(ident) =>
        // B8: OPEN SCHEMA s → USE s.
        spark.sql(s"USE ${Params.quote(ident)}")
        QueryResult.empty(stmt)
      case _ if SqlCompat.parseUpdate(stmt)
          .exists(u => SqlCompat.canHandle(spark, u)) =>
        // B4: UPDATE on a parquet catalog table — read-transform-overwrite
        // (SqlCompat); rows_affected = matched rows, like the host engine.
        val affected =
          SqlCompat.runUpdate(spark, SqlCompat.parseUpdate(stmt).get)
        new QueryResult(stmt, None, Some(affected), None)
      case _ if SqlCompat.parseDelete(stmt)
          .exists(del => SqlCompat.canHandle(spark, del)) =>
        // DELETE, same emulation: keep-complement + overwrite.
        val affected =
          SqlCompat.runDelete(spark, SqlCompat.parseDelete(stmt).get)
        new QueryResult(stmt, None, Some(affected), None)
      case _ if SqlCompat.parseMerge(stmt)
          .exists(mg => SqlCompat.canHandle(spark, mg)) =>
        // MERGE (Exasol/ANSI upsert): one full-outer join pass, then the
        // same verified checkpoint-overwrite as UPDATE/DELETE.
        val affected =
          SqlCompat.runMerge(spark, SqlCompat.parseMerge(stmt).get)
        new QueryResult(stmt, None, Some(affected), None)
      case _ if SqlCompat.parseImport(stmt)
          .exists(im => SqlCompat.canHandle(spark, im)) =>
        // Exasol IMPORT … FROM CSV: schema'd ingest with quarantine lane;
        // rows_affected = loaded rows, quarantined count logged.
        val (loaded, bad) =
          SqlCompat.runImport(spark, SqlCompat.parseImport(stmt).get)
        if (bad > 0) log("WARNING", s"IMPORT quarantined $bad malformed row(s)")
        new QueryResult(stmt, None, Some(loaded), None)
      case _ if SqlCompat.parseFbvImport(stmt)
          .exists(fb => SqlCompat.canHandle(spark, fb)) =>
        // Exasol IMPORT … FROM FBV (fixed-byte-value): fixed-width ingest
        // through the same quarantine lane.
        val (loaded, bad) =
          SqlCompat.runFbvImport(spark, SqlCompat.parseFbvImport(stmt).get)
        if (bad > 0) log("WARNING", s"IMPORT quarantined $bad malformed row(s)")
        new QueryResult(stmt, None, Some(loaded), None)
      case _ if SqlCompat.parseExport(stmt)
          .exists(ex => SqlCompat.canHandle(spark, ex)) =>
        // Exasol EXPORT … INTO CSV: table → CSV directory.
        val exported =
          SqlCompat.runExport(spark, SqlCompat.parseExport(stmt).get)
        new QueryResult(stmt, None, Some(exported), None)
      case _ if SqlCompat.parseParquetImport(stmt)
          .exists(im => SqlCompat.canHandle(spark, im)) =>
        // IMPORT … FROM PARQUET: typed columnar ingest (no quarantine —
        // parquet rows can't be malformed), by-name column alignment.
        val loaded = SqlCompat.runParquetImport(spark,
          SqlCompat.parseParquetImport(stmt).get)
        new QueryResult(stmt, None, Some(loaded), None)
      case _ if SqlCompat.parseParquetExport(stmt)
          .exists(ex => SqlCompat.canHandle(spark, ex)) =>
        // EXPORT … INTO PARQUET: table/query → parquet directory.
        val exported = SqlCompat.runParquetExport(spark,
          SqlCompat.parseParquetExport(stmt).get)
        new QueryResult(stmt, None, Some(exported), None)
      case _ if SqlCompat.handleConnectionDdl(stmt, durableCatalog) =>
        // CREATE/DROP CONNECTION: named JDBC endpoints for IMPORT/EXPORT.
        QueryResult.empty(stmt)
      case _ if SqlCompat.parseJdbcImport(stmt)
          .exists(im => SqlCompat.canHandle(spark, im)) =>
        // Exasol IMPORT … FROM JDBC: external database → local table;
        // each STATEMENT clause is its own parallel cursor. Cast
        // failures ride the CSV lane's quarantine (+ ERRORS INTO /
        // REJECT LIMIT).
        val (loaded, bad) =
          SqlCompat.runJdbcImport(spark, SqlCompat.parseJdbcImport(stmt).get)
        if (bad > 0) log("WARNING", s"IMPORT quarantined $bad malformed row(s)")
        new QueryResult(stmt, None, Some(loaded), None)
      case _ if SqlCompat.parseJdbcExport(stmt)
          .exists(ex => SqlCompat.canHandle(spark, ex)) =>
        // Exasol EXPORT … INTO JDBC: table/query → external database.
        val exported =
          SqlCompat.runJdbcExport(spark, SqlCompat.parseJdbcExport(stmt).get)
        new QueryResult(stmt, None, Some(exported), None)
      case _ if SqlCompat.parseExecuteScript(stmt)
          .exists(e => ScriptRegistry.lookup(e.name).isDefined) =>
        // B16 end-to-end: `EXECUTE SCRIPT name(args)` (RM:35-37, 69)
        // dispatches a registered EtlJob — a FRESH wrapper + job_log
        // registration, like the host engine spawning the script's own
        // session; the result is the finished job's messages table
        // (RETURNS TABLE analog). Shares this wrapper's log store and
        // clock, so script runs land in the same job_log.
        val e = SqlCompat.parseExecuteScript(stmt).get
        val sc = ScriptRegistry.lookup(e.name).get
        val df = EtlJob.execute(spark, logStore, e.name.replace("`", ""),
          sc.steps(e.args), sc.onError, clock)
        val res = QueryResult.success(stmt, df, None)
        res.normalizedRowCount
        res
      case _ if SqlCompat.parseAsOf(stmt)
          .exists(q => SqlCompat.canHandle(spark, q)) =>
        // ASOF [LEFT] JOIN dialect → the single-shuffle as-of operator.
        val df = SqlCompat.runAsOf(spark, SqlCompat.parseAsOf(stmt).get)
        val res = QueryResult.success(stmt, df, rowsAffectedOf(df))
        res.normalizedRowCount
        res
      case _ =>
        // Dialect translations, no-ops for Spark-native SQL:
        // CONNECT BY hierarchical queries → recursive CTE, then
        // PREFERRING skyline → NOT-EXISTS dominance, then
        // GROUP_CONCAT → listagg, then the B10 Exasol datetime-format
        // dialect (the reference's own
        // TO_TIMESTAMP(?, 'YYYY-MM-DD HH24:MI:SS'), QW:98) → Spark
        // patterns; TO_CHAR → date_format.
        val translated = SqlCompat.translateDatetimeFormats(
          SqlCompat.translateRatioToReport(
          SqlCompat.translateGroupConcat {
            val cb = SqlCompat.translateConnectBy(stmt).getOrElse(stmt)
            val pf = SqlCompat.translatePreferring(cb).getOrElse(cb)
            // QUALIFY (window-expression filter) → subquery spelling
            val qf = SqlCompat.translateQualify(pf).getOrElse(pf)
            // Oracle-compat ROWNUM filter → LIMIT (subquery-wrapped
            // under ORDER BY: the host numbers rows BEFORE the sort);
            // select-list ROWNUM numbering → ROW_NUMBER() OVER the
            // statement's own ORDER BY
            val rn = SqlCompat.translateRownum(qf).getOrElse(qf)
            SqlCompat.translateSelectRownum(rn).getOrElse(rn)
          }))
        val referenced = Params.valueParamNames(translated)
        val args: Map[String, Any] = referenced.flatMap { name =>
          params.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => name -> v }
        }.toMap
        val df = if (args.isEmpty) spark.sql(translated)
                 else spark.sql(translated, args)
        val res = QueryResult.success(stmt, df, rowsAffectedOf(df))
        // Force the rowcount here so RUNTIME failures (not just analysis
        // errors) hit the wrapper's error path — `pquery` materializes
        // eagerly, so its failures are always query failures (QW:41).
        // This is a distributed count: no rows cross to the driver.
        res.normalizedRowCount
        res
    }

  /** `rows_affected` for wrapper-mediated DML: commands execute eagerly under
    * `spark.sql`, and a write command's physical node carries the written-row
    * metric. Absent (plain SELECT, DDL) → None → rowcount falls back to the
    * result-row rules (QW:51–59). */
  private def rowsAffectedOf(df: DataFrame): Option[Long] = try {
    df.queryExecution.executedPlan match {
      case c: org.apache.spark.sql.execution.CommandResultExec =>
        c.commandPhysicalPlan.metrics.get("numOutputRows").map(_.value)
      case _ => None
    }
  } catch { case NonFatal(_) => None }

  private def toError(e: Throwable): QueryError = {
    val code = e match {
      case st: SparkThrowable if st.getSqlState != null => st.getSqlState
      case st: SparkThrowable if st.getCondition != null => st.getCondition
      case other => other.getClass.getSimpleName
    }
    QueryError(code, Option(e.getMessage).getOrElse(e.toString))
  }

  // ------------------------------------------------------------------ A6–A8

  /** Flush new buffered messages to `job_details` (QW:87–125). One batched
    * append (the 100-row chunking was an Exasol resource workaround); the
    * offset advances past attempted rows, and a flush failure downgrades to a
    * WARNING rather than failing the job — reference intent (QW:117–119). */
  private[wrapper] def writeLogDetails(): Unit = logStore.foreach { ls =>
    if (messageLogOffset < messages.length) {
      val batch = messages.slice(messageLogOffset, messages.length).toSeq
      messageLogOffset = messages.length
      Try(ls.appendDetails(batch)) match {
        case Failure(e) =>
          log("WARNING", s"Failed to write detail log: ${e.getMessage}")
        case _ => ()
      }
    }
  }

  private def transaction(sql: String, logging: Boolean): (Boolean, QueryResult) = {
    val (success, info) = query(sql, QueryOptions(logging = logging))
    if (success && logStore.isDefined) {
      writeLogDetails()
      // QW:133: 'commit -- wrapper-log', never recursing into transaction().
      query("commit -- wrapper-log", QueryOptions(logging = false))
    }
    (success, info)
  }

  /** Commit: execute the `commit -- wrapper` marker, then flush the log
    * buffer (QW:127–140). */
  def commit(logging: Boolean = true): (Boolean, QueryResult) =
    transaction("commit -- wrapper", logging)

  /** Rollback: logs still flush — they survive the data rollback
    * (QW:127–136, 142–144). */
  def rollback(logging: Boolean = true): (Boolean, QueryResult) =
    transaction("rollback -- wrapper", logging)

  // ------------------------------------------------------------------ A9

  /** Terminal lifecycle step (QW:146–193): commit (or rollback), close the
    * `job_log` row with end_time + rolled-up status, restore the starting
    * schema, return the buffered messages with the QW:414 schema. */
  def finish(rollback: Boolean = false): DataFrame = {
    val wasFinishing = finishing
    finishing = true
    try {
      val (success, res) =
        if (rollback) this.rollback() else this.commit()
      if (!success) throw new QueryWrapperException(
        s"[querywrapper] finish() while commiting / rollbacking [${res.errorCode}] ${res.errorMessage}")
      runId.foreach { id =>
        val state =
          if (errors > 0) "FINISHED WITH ERROR" else "FINISHED SUCCESSFULLY"
        logStore.foreach(_.close(id, state))
        // QW:180–183: trailing commit, flushes anything logged since.
        transaction("commit -- wrapper", logging = false)
      }
      startingSchema.foreach { s =>
        query(s"OPEN SCHEMA $s", QueryOptions(logging = false))
      }
      messagesDataFrame
    } finally { finishing = wasFinishing }
  }

  /** The buffered messages as a DataFrame matching the reference's
    * `messages_types` schema string (QW:414). */
  def messagesDataFrame: DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("run_id", LongType),
      StructField("msg_time", StringType),
      StructField("msg_type", StringType),
      StructField("message", StringType),
      StructField("rowcount", LongType)))
    val rows: Seq[Row] = messages.toSeq.map { m =>
      Row(m.runId.map(Long.box).orNull, m.msgTime, m.msgType, m.message,
        m.rowcount.map(Long.box).orNull)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  // ------------------------------------------------------------------ A10–A13

  def setParam(name: String, value: Any): Unit = queryParams(name) = value
  def getParam(name: String): Option[Any] = queryParams.get(name)
  def loadParams(params: Map[String, Any]): Unit =
    params.foreach { case (k, v) => setParam(k, v) }

  /** Load (name, value) pairs from the first two columns of a table
    * (QW:211–224), logging the loaded set in the reference's
    * `{ "k" = "v", ... }` INFO format. */
  def loadParamsFromTable(tableName: String): Unit = {
    setParam("PARAMETERS_TABLE", tableName)
    val (_, res) = query("SELECT * FROM ::PARAMETERS_TABLE")
    val entries = res.rows.toSeq.map { r =>
      val name = String.valueOf(r.get(0))
      val value = r.get(1)
      setParam(name, value)
      "\"" + name + "\" = \"" + String.valueOf(value) + "\""
    }
    log("INFO", s"Loaded Parameters from Table $tableName: " +
      entries.mkString("{ ", ", ", " }"))
  }

  // ------------------------------------------------------------------ A14

  /** Procedural step executor (QW:226–243): START/INFO/ERROR log protocol,
    * abort-mode re-raise, undefined function → ERROR + raise. */
  def run[A](pkg: Map[String, QueryWrapper => A], fnName: String): (Boolean, Any) =
    pkg.get(fnName) match {
      case Some(fn) =>
        log("START", s"Entering function $fnName")
        Try(fn(this)) match {
          case Success(v) =>
            log("INFO", s"Finished function $fnName")
            (true, v)
          case Failure(e) =>
            log("ERROR", s"$fnName returned with error: ${e.getMessage}")
            if (onError == "abort") throw e
            (false, e.getMessage)
        }
      case None =>
        log("ERROR", s"Undefined function $fnName")
        throw new QueryWrapperException(s"Undefined function $fnName")
    }

  // ------------------------------------------------------------------ A16/A17

  /** Rewrite `?` placeholders (outside literals/comments) to `:PS_VAL_n` and
    * return a prepared statement (QW:303–335). */
  def prepare(sqlText: String): PreparedStatement = {
    val (rewritten, n) = SqlTokens.rewritePlaceholders(sqlText)
    new PreparedStatement(this, rewritten, n)
  }

  // ------------------------------------------------------------------ A18–A20

  /** Row iterator over a query or an existing result (QW:352–373); fields
    * readable by name or 1-based index via [[ResultRow]]. Streams via
    * `toLocalIterator` — never collects the whole result on the driver. */
  def queryRows(sqlText: String): Iterator[ResultRow] =
    queryRows(querySuccess(sqlText))

  def queryRows(res: QueryResult): Iterator[ResultRow] =
    res.localIterator.map(ResultRow)

  /** Destructured values iterator (QW:375–408): each row as a Seq, matching
    * the README's `for a, b in wrapper:query_values(...)` loop. */
  def queryValues(sqlText: String): Iterator[Seq[Any]] =
    queryValues(querySuccess(sqlText))

  def queryValues(res: QueryResult): Iterator[Seq[Any]] =
    res.localIterator.map(_.toSeq)

  private def querySuccess(sqlText: String): QueryResult = query(sqlText)._2

  // ------------------------------------------------------------------ A21

  private[wrapper] def init(): Unit = {
    // Dialect surface: make the Exasol function aliases + native sketch
    // functions SQL-visible, so pass-through statements (QW:40 delegation)
    // run unchanged. Idempotent re-registration.
    graft.functions.GraftExtensions.register(spark)
    // Durable catalog objects from prior sessions become visible before
    // any statement can reference them (host engines resolve scripts and
    // connections from the shared catalog at statement time).
    durableCatalog.foreach(_.rehydrate())
    logStore.foreach { ls =>
      // QW:246–283: INSERT-then-MAX id allocation + early commit.
      val id = ls.register(scriptName)
      runId = Some(id)
      log("INFO", s"Job nr. $id registered")
      transaction("commit -- wrapper", logging = false)
    }
    // QW:452: capture CURRENT_SCHEMA to restore at finish().
    startingSchema = Try(spark.catalog.currentDatabase).toOption
  }
}

object QueryWrapper {

  /** Constructor (reference `new`, QW:410–458). `logStore = None` is the
    * fully in-memory mode: logging works, nothing persists (QW:161, 448). */
  def apply(
      spark: SparkSession,
      logStore: Option[LogStore] = None,
      scriptName: String = "",
      clock: () => Instant = () => Instant.now()): QueryWrapper = {
    val w = new QueryWrapper(spark, logStore, scriptName, clock)
    w.init()
    w
  }
}
