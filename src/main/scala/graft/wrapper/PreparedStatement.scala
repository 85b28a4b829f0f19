package graft.wrapper

/** Prepared statement (reference `wrap_prepare`/`wrap_ps_execute`,
  * query_wrapper.sql:285–335): holds the `?`→`:PS_VAL_n`-rewritten SQL and
  * its placeholder arity; `execute` binds each value row positionally and
  * runs the statement, aborting early on the first failure.
  *
  * Indices are 1-based inclusive, matching the Lua original (QW:289).
  * Missing/null cells bind as SQL NULL (QW:291 `values[row][p] or null`).
  *
  * Scale note: per-row re-execution is the reference's semantics and is kept
  * for parity; for bulk loads, build a DataFrame and write it in one batch
  * instead (what [[QueryWrapper.writeLogDetails]] does for the log flush).
  */
final class PreparedStatement(
    wrapper: QueryWrapper,
    val sqlText: String,
    val paramCount: Int) {

  def execute(
      values: Seq[Seq[Any]],
      startIndex: Int = 1,
      endIndex: Int = -1,
      options: QueryOptions = QueryOptions()): (Boolean, Vector[QueryResult]) = {
    val end = if (endIndex < 0) values.length else math.min(endIndex, values.length)
    val results = Vector.newBuilder[QueryResult]
    var row = startIndex
    while (row <= end) {
      val cells = values(row - 1)
      (1 to paramCount).foreach { p =>
        wrapper.setParam(s"PS_VAL_$p", if (p <= cells.length) cells(p - 1) else null)
      }
      val (ok, res) = wrapper.query(sqlText, options)
      results += res
      if (!ok) return (false, results.result()) // early abort (QW:296–298)
      row += 1
    }
    (true, results.result())
  }
}
