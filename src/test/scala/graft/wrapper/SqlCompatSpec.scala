package graft.wrapper

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** B4: UPDATE pass-through on parquet catalog tables via
  * read-transform-overwrite, with old-row SET semantics. */
class SqlCompatSpec extends AnyFunSuite with SparkTestBase {

  test("parseUpdate handles SET lists, WHERE, and literal commas") {
    val u = SqlCompat.parseUpdate(
      "UPDATE t SET a = concat(b, ',', c), b = a WHERE a > 1").get
    assert(u.table == "t")
    assert(u.assignments == Seq(("a", "concat(b, ',', c)"), ("b", "a")))
    assert(u.where.contains("a > 1"))
    assert(SqlCompat.parseUpdate("SELECT * FROM t").isEmpty)
    val noWhere = SqlCompat.parseUpdate("update s.t set x = 1")
    assert(noWhere.get.table == "s.t" && noWhere.get.where.isEmpty)
  }

  test("parse: WHERE inside literals, comments, and subqueries never splits") {
    // 'where' inside a string literal in the SET clause:
    val u = SqlCompat.parseUpdate(
      "UPDATE t SET note = 'see where it goes' WHERE id > 5").get
    assert(u.assignments == Seq(("note", "'see where it goes'")))
    assert(u.where.contains("id > 5"))
    // literal-only SET, no top-level WHERE at all:
    val u2 = SqlCompat.parseUpdate("UPDATE t SET note = 'where am i';").get
    assert(u2.where.isEmpty)
    assert(u2.assignments == Seq(("note", "'where am i'")))
    // WHERE inside a SET-clause subquery stays with the assignment:
    val u3 = SqlCompat.parseUpdate(
      "UPDATE t SET x = (SELECT max(v) FROM s WHERE s.id = 1) WHERE t.id = 2").get
    assert(u3.assignments ==
      Seq(("x", "(SELECT max(v) FROM s WHERE s.id = 1)")))
    assert(u3.where.contains("t.id = 2"))
    // comment containing 'where' is not a clause boundary:
    val u4 = SqlCompat.parseUpdate(
      "UPDATE t SET a = 1 -- where b = 2\n").get
    assert(u4.where.isEmpty && u4.assignments == Seq(("a", "1")))
    // DELETE with the predicate value containing 'where':
    val d = SqlCompat.parseDelete(
      "DELETE FROM t WHERE note = 'delete from x where y'").get
    assert(d.where.contains("note = 'delete from x where y'"))
    assert(SqlCompat.parseDelete("delete from t;").get.where.isEmpty)
  }

  test("wrapper UPDATE: rows_affected, WHERE gating, old-row semantics") {
    val loc = Files.createTempDirectory("upd").toString
    spark.sql(s"CREATE TABLE upd_t (a BIGINT, b BIGINT) USING parquet LOCATION '$loc/t'")
    try {
      spark.sql("INSERT INTO upd_t VALUES (1, 10), (2, 20), (3, 30)")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query("UPDATE upd_t SET a = b, b = a WHERE a >= 2")
      assert(ok)
      assert(res.rowsAffected.contains(2L))
      assert(res.normalizedRowCount == 2)
      val rows = spark.table("upd_t").orderBy("b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // rows 2 and 3 swapped (old-row semantics); row 1 untouched
      assert(rows.toSet == Set((1L, 10L), (20L, 2L), (30L, 3L)))
      // auto-log carries the DML rowcount:
      assert(w.messages.last.rowcount.contains(2L))
    } finally spark.sql("DROP TABLE IF EXISTS upd_t")
  }

  test("datetime format dialect translates inside TO_* calls only") {
    val in = "INSERT INTO t VALUES (?, TO_TIMESTAMP(?, 'YYYY-MM-DD HH24:MI:SS'), 'YYYY')"
    assert(SqlCompat.translateDatetimeFormats(in) ==
      "INSERT INTO t VALUES (?, TO_TIMESTAMP(?, 'yyyy-MM-dd HH:mm:ss'), 'YYYY')")
    // First-arg data literal untouched; second-arg format translated:
    assert(SqlCompat.translateDatetimeFormats(
      "SELECT TO_DATE('2026-01-02', 'YYYY-MM-DD')") ==
      "SELECT TO_DATE('2026-01-02', 'yyyy-MM-dd')")
    // TO_CHAR renames to date_format:
    assert(SqlCompat.translateDatetimeFormats(
      "SELECT TO_CHAR(ts, 'DD.MON.YYYY') FROM t") ==
      "SELECT date_format(ts, 'dd.MMM.yyyy') FROM t")
    // Outside a TO_* call nothing changes, including comments/strings:
    val noop = "SELECT 'HH24:MI' AS s -- YYYY\nFROM t"
    assert(SqlCompat.translateDatetimeFormats(noop) == noop)
  }

  test("wrapper executes the reference's QW:98 format end-to-end") {
    val w = QueryWrapper(spark)
    val (ok, res) = w.query(
      "SELECT TO_TIMESTAMP('2026-01-02 03:04:05', 'YYYY-MM-DD HH24:MI:SS') AS t")
    assert(ok)
    assert(res.rows.head.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2026-01-02 03:04:05"))
  }

  test("wrapper DELETE: rows_affected, WHERE gating, NULL predicate keeps") {
    val loc = Files.createTempDirectory("del").toString
    spark.sql(s"CREATE TABLE del_t (a BIGINT, b BIGINT) USING parquet LOCATION '$loc/t'")
    try {
      spark.sql("INSERT INTO del_t VALUES (1, 10), (2, NULL), (3, 30)")
      val w = QueryWrapper(spark)
      // b > 15 is NULL for row 2 -> row 2 must survive.
      val (ok, res) = w.query("DELETE FROM del_t WHERE b > 15")
      assert(ok)
      assert(res.rowsAffected.contains(1L))
      val left = spark.table("del_t").orderBy("a").collect().map(_.getLong(0))
      assert(left.toSeq == Seq(1L, 2L))
      // Unconditional delete empties the table:
      val (_, res2) = w.query("DELETE FROM del_t")
      assert(res2.rowsAffected.contains(2L))
      assert(spark.table("del_t").count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS del_t")
  }

  test("parseMerge: clauses, aliases, CASE WHEN in SET, cols/values") {
    val m = SqlCompat.parseMerge(
      """MERGE INTO tgt t USING src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = CASE WHEN s.v > 0 THEN s.v ELSE t.v END
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin).get
    assert(m.target == "tgt" && m.targetAlias == "t")
    assert(m.source == "src" && m.sourceAlias == "s")
    assert(m.condition == "t.id = s.id")
    assert(m.matchedSet.contains(
      Seq(("v", "CASE WHEN s.v > 0 THEN s.v ELSE t.v END"))))
    assert(!m.matchedDelete)
    assert(m.insert.contains((Some(Seq("id", "v")), Seq("s.id", "s.v"))))
    // DELETE clause form; default aliases = table names:
    val d = SqlCompat.parseMerge(
      "MERGE INTO tgt USING src ON tgt.id = src.id WHEN MATCHED THEN DELETE").get
    assert(d.matchedDelete && d.matchedSet.isEmpty && d.insert.isEmpty)
    assert(d.targetAlias == "tgt" && d.sourceAlias == "src")
    assert(SqlCompat.parseMerge("SELECT 1").isEmpty)
  }

  test("wrapper MERGE: update + insert + rows_affected") {
    val loc = Files.createTempDirectory("mrg").toString
    spark.sql(s"CREATE TABLE mrg_t (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/t'")
    spark.sql(s"CREATE TABLE mrg_s (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/s'")
    try {
      spark.sql("INSERT INTO mrg_t VALUES (1, 10), (2, 20), (3, 30)")
      spark.sql("INSERT INTO mrg_s VALUES (2, 200), (4, 400)")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        """MERGE INTO mrg_t t USING mrg_s s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
      assert(ok, res.error)
      assert(res.rowsAffected.contains(2L)) // 1 updated + 1 inserted
      val rows = spark.table("mrg_t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 10L), (2L, 200L), (3L, 30L), (4L, 400L)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mrg_t")
      spark.sql("DROP TABLE IF EXISTS mrg_s")
    }
  }

  test("wrapper MERGE: DELETE clause and ambiguous-match abort") {
    val loc = Files.createTempDirectory("mrg2").toString
    spark.sql(s"CREATE TABLE mrg2_t (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/t'")
    spark.sql(s"CREATE TABLE mrg2_s (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/s'")
    try {
      spark.sql("INSERT INTO mrg2_t VALUES (1, 10), (2, 20)")
      spark.sql("INSERT INTO mrg2_s VALUES (2, 999)")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        "MERGE INTO mrg2_t t USING mrg2_s s ON t.id = s.id WHEN MATCHED THEN DELETE")
      assert(ok, res.error)
      assert(res.rowsAffected.contains(1L))
      assert(spark.table("mrg2_t").collect().map(_.getLong(0)).toSeq == Seq(1L))

      // Two source rows matching one target row must abort, table unchanged:
      spark.sql("INSERT INTO mrg2_s VALUES (1, 111), (1, 222)")
      w.onError = "continue"
      val (ok2, res2) = w.query(
        "MERGE INTO mrg2_t t USING mrg2_s s ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v")
      assert(!ok2 && res2.error.exists(_.message.contains("multiple")))
      assert(spark.table("mrg2_t").collect().map(_.getLong(1)).toSeq == Seq(10L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mrg2_t")
      spark.sql("DROP TABLE IF EXISTS mrg2_s")
    }
  }

  test("CONNECT BY translates to a recursive CTE and runs end-to-end") {
    // Both clause orders parse; non-hierarchical SQL is untouched.
    assert(SqlCompat.translateConnectBy("SELECT * FROM t WHERE x = 1").isEmpty)
    assert(SqlCompat.translateConnectBy(
      "SELECT name FROM emp CONNECT BY PRIOR id = mgr_id START WITH mgr_id IS NULL").isDefined)

    // Org chart: 1 root, two children, one grandchild.
    import graft.SparkTestBase.spark.implicits._
    Seq((1L, Option.empty[Long], "ceo"), (2L, Some(1L), "vp_a"),
      (3L, Some(1L), "vp_b"), (4L, Some(2L), "eng"))
      .toDF("id", "mgr_id", "name").createOrReplaceTempView("cb_emp")

    val w = QueryWrapper(spark)
    val (ok, res) = w.query(
      """SELECT name, LEVEL FROM cb_emp
        |START WITH mgr_id IS NULL
        |CONNECT BY PRIOR id = mgr_id""".stripMargin)
    assert(ok, res.error)
    val byName = res.rows.map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(byName == Map("ceo" -> 1, "vp_a" -> 2, "vp_b" -> 2, "eng" -> 3))

    // PRIOR on the right-hand side descends the same hierarchy:
    val (ok2, res2) = w.query(
      """SELECT name FROM cb_emp
        |CONNECT BY mgr_id = PRIOR id START WITH id = 2""".stripMargin)
    assert(ok2, res2.error)
    assert(res2.rows.map(_.getString(0)).toSet == Set("vp_a", "eng"))
  }

  test("IMPORT/EXPORT CSV round-trip through the wrapper") {
    val loc = Files.createTempDirectory("impexp").toString
    spark.sql(s"CREATE TABLE ie_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      // CSV with a header (SKIP = 1), semicolon-separated, one bad row.
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$loc/in.csv"),
        "id;name\n1;alpha\n2;beta\nnot_a_number;gamma\n")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        s"IMPORT INTO ie_t FROM LOCAL CSV FILE '$loc/in.csv' COLUMN SEPARATOR = ';' SKIP = 1")
      assert(ok, res.error)
      assert(res.rowsAffected.contains(2L)) // the bad row quarantines
      assert(w.messages.exists(m => m.msgType == "WARNING" &&
        m.message.contains("quarantined 1")))
      assert(spark.table("ie_t").count() == 2L)

      val (ok2, res2) = w.query(
        s"EXPORT ie_t INTO CSV FILE '$loc/out' WITH COLUMN NAMES")
      assert(ok2, res2.error)
      assert(res2.rowsAffected.contains(2L))
      val back = spark.read.option("header", "true").csv(s"$loc/out")
        .orderBy("id").collect().map(r => (r.getString(0), r.getString(1)))
      assert(back.toSeq == Seq(("1", "alpha"), ("2", "beta")))

      // EXPORT of a parenthesized query (no WITH COLUMN NAMES → no header,
      // host-engine default):
      val (ok3, res3) = w.query(
        s"EXPORT (SELECT id * 10 AS id10 FROM ie_t WHERE id = 1) INTO CSV FILE '$loc/out2'")
      assert(ok3, res3.error)
      assert(res3.rowsAffected.contains(1L))
      assert(spark.read.csv(s"$loc/out2").head().getString(0) == "10")
    } finally spark.sql("DROP TABLE IF EXISTS ie_t")
  }

  test("IMPORT/EXPORT CSV AT: url and connection bases resolve; the " +
      "host engine's http remote-file protocol is refused with guidance") {
    val loc = Files.createTempDirectory("impexpat").toString
    spark.sql(s"CREATE TABLE at_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$loc/in.csv"),
        "1;alpha\n2;beta\n")
      val w = QueryWrapper(spark)
      // named CONNECTION as the base (the Exasol remote-loader shape);
      // OR REPLACE so a rerun in the same JVM never trips the registry
      assert(SqlCompat.handleConnectionDdl(
        s"CREATE OR REPLACE CONNECTION at_files TO 'file://$loc'"))
      val (ok, res) = w.query(
        "IMPORT INTO at_t FROM CSV AT at_files FILE 'in.csv' COLUMN SEPARATOR = ';'")
      assert(ok, res.error)
      assert(spark.table("at_t").count() == 2L)
      // URL literal base, relative FILE joined against it
      val (ok2, res2) = w.query(
        s"EXPORT at_t INTO CSV AT '$loc' FILE 'outat' WITH COLUMN NAMES")
      assert(ok2, res2.error)
      assert(spark.read.option("header", "true").csv(s"$loc/outat").count() == 2L)
      // the PARQUET and FBV lanes share the same AT grammar
      val pq = SqlCompat.parseParquetImport(
        "IMPORT INTO at_t FROM PARQUET AT at_files FILE 'part.parquet'").get
      assert(pq.paths == Seq(s"file://$loc/part.parquet"))
      val pe = SqlCompat.parseParquetExport(
        s"EXPORT at_t INTO PARQUET AT '$loc' FILE 'pqout'").get
      assert(pe.path == s"$loc/pqout")
      val fb = SqlCompat.parseFbvImport(
        "IMPORT INTO at_t FROM FBV AT at_files FILE 'x.fbv' (SIZE=4, SIZE=6)").get
      assert(fb.path == s"file://$loc/x.fbv" && fb.sizes == Seq(4, 6))
      // parse level: http(s) refused with the object-storage guidance...
      val e = intercept[UnsupportedOperationException] {
        SqlCompat.parseImport(
          "IMPORT INTO at_t FROM CSV AT 'https://host/base' FILE 'f.csv'")
      }
      assert(e.getMessage.contains("https") &&
        e.getMessage.contains("Hadoop-compatible"))
      // ...an unknown connection fails by name...
      val e2 = intercept[IllegalArgumentException] {
        SqlCompat.parseImport(
          "IMPORT INTO at_t FROM CSV AT no_such_conn FILE 'f.csv'")
      }
      assert(e2.getMessage.contains("NO_SUCH_CONN"))
      // ...and credentials are refused rather than half-honored: inline
      val e3 = intercept[UnsupportedOperationException] {
        SqlCompat.parseImport("IMPORT INTO at_t FROM CSV AT 'hdfs://base' " +
          "USER 'u' IDENTIFIED BY 'p' FILE 'f.csv'")
      }
      assert(e3.getMessage.contains("Hadoop configuration"))
      // ...and carried on a named connection
      assert(SqlCompat.handleConnectionDdl("CREATE OR REPLACE CONNECTION " +
        s"at_cred TO 'file://$loc' USER 'u' IDENTIFIED BY 'p'"))
      val e4 = intercept[UnsupportedOperationException] {
        SqlCompat.parseImport(
          "IMPORT INTO at_t FROM CSV AT at_cred FILE 'f.csv'")
      }
      assert(e4.getMessage.contains("AT_CRED"))
      // AT-less statements parse exactly as before (base = None)
      val plain = SqlCompat.parseImport(
        "IMPORT INTO at_t FROM CSV FILE '/abs/x.csv'").get
      assert(plain.paths == Seq("/abs/x.csv"))
    } finally {
      SqlCompat.handleConnectionDdl("DROP CONNECTION IF EXISTS at_files")
      SqlCompat.handleConnectionDdl("DROP CONNECTION IF EXISTS at_cred")
      spark.sql("DROP TABLE IF EXISTS at_t")
    }
  }

  test("quoted keyword identifiers never match clause keywords") {
    // `where` as a column name (the main reason users quote identifiers):
    val u = SqlCompat.parseUpdate("UPDATE t SET `where` = 1 WHERE id = 2").get
    assert(u.assignments == Seq(("`where`", "1")))
    assert(u.where.contains("id = 2"))
    val u2 = SqlCompat.parseUpdate("UPDATE t SET `where` = 1").get
    assert(u2.where.isEmpty && u2.assignments == Seq(("`where`", "1")))
  }

  test("unsupported MERGE shapes parse to None, not a throw") {
    // A WHEN MATCHED action that isn't UPDATE/DELETE -> None (falls through
    // to spark.sql for the engine's own error):
    assert(SqlCompat.parseMerge(
      "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN INSERT (id) VALUES (s.id)").isEmpty)
    // Garbage between MATCHED and THEN (not an AND condition) -> None:
    assert(SqlCompat.parseMerge(
      "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED OR true THEN DELETE").isEmpty)
    // A paren inside the EXPORT query's string literal must not break
    // the head match:
    val e = SqlCompat.parseExport(
      "EXPORT (SELECT ')' AS c FROM t) INTO CSV FILE '/tmp/o'").get
    assert(e.source == Right("SELECT ')' AS c FROM t"))
  }

  test("parseMerge: conditional WHEN clauses (AND cond) parse in order") {
    val m = SqlCompat.parseMerge(
      """MERGE INTO tgt t USING src s ON t.id = s.id
        |WHEN MATCHED AND s.del = 'Y' THEN DELETE
        |WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED AND s.v > 0 THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin).get
    assert(m.clauses == Seq(
      SqlCompat.MatchedDelete(Some("s.del = 'Y'")),
      SqlCompat.MatchedUpdate(Some("s.v > t.v"), Seq(("v", "s.v"))),
      SqlCompat.NotMatchedInsert(Some("s.v > 0"),
        Some(Seq("id", "v")), Seq("s.id", "s.v"))))
    // A parenthesized CASE … THEN inside the condition never splits the
    // clause (THEN detection runs on the masked text):
    val c = SqlCompat.parseMerge(
      """MERGE INTO tgt USING src ON tgt.id = src.id
        |WHEN MATCHED AND (CASE WHEN src.v > 0 THEN 1 ELSE 0 END) = 1
        |THEN UPDATE SET v = src.v""".stripMargin).get
    assert(c.clauses == Seq(SqlCompat.MatchedUpdate(
      Some("(CASE WHEN src.v > 0 THEN 1 ELSE 0 END) = 1"),
      Seq(("v", "src.v")))))
  }

  test("wrapper MERGE: conditional clauses gate update/delete/insert per row") {
    val loc = Files.createTempDirectory("mrgc").toString
    spark.sql(s"CREATE TABLE mrgc_t (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/t'")
    spark.sql(s"CREATE TABLE mrgc_s (id BIGINT, v BIGINT, del STRING) USING parquet LOCATION '$loc/s'")
    try {
      spark.sql("INSERT INTO mrgc_t VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
      // id=1: delete cond hits; id=2: update cond hits (99 > 20);
      // id=3: NO clause applies (del='N', 5 < 30) -> passes through;
      // id=5: insert cond hits; id=6: insert cond misses -> NOT inserted.
      spark.sql("""INSERT INTO mrgc_s VALUES
        (1, 0, 'Y'), (2, 99, 'N'), (3, 5, 'N'), (5, 50, 'N'), (6, -1, 'N')""")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        """MERGE INTO mrgc_t t USING mrgc_s s ON t.id = s.id
          |WHEN MATCHED AND s.del = 'Y' THEN DELETE
          |WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED AND s.v > 0 THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
      assert(ok, res.error)
      assert(res.rowsAffected.contains(3L)) // 1 delete + 1 update + 1 insert
      val rows = spark.table("mrgc_t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((2L, 99L), (3L, 30L), (4L, 40L), (5L, 50L)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mrgc_t")
      spark.sql("DROP TABLE IF EXISTS mrgc_s")
    }
  }

  test("insert-only MERGE counts only inserts in rows_affected") {
    val loc = Files.createTempDirectory("mrgi").toString
    spark.sql(s"CREATE TABLE mrgi_t (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/t'")
    spark.sql(s"CREATE TABLE mrgi_s (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/s'")
    try {
      spark.sql("INSERT INTO mrgi_t VALUES (1, 10), (2, 20)")
      spark.sql("INSERT INTO mrgi_s VALUES (1, 111), (9, 90)")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        """MERGE INTO mrgi_t t USING mrgi_s s ON t.id = s.id
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
      assert(ok, res.error)
      // The matched row (id=1) is untouched -> affected = 1 insert only.
      assert(res.rowsAffected.contains(1L))
      val rows = spark.table("mrgi_t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 10L), (2L, 20L), (9L, 90L)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mrgi_t")
      spark.sql("DROP TABLE IF EXISTS mrgi_s")
    }
  }

  test("IMPORT SKIP > 1 drops the preamble lines before parsing") {
    val loc = Files.createTempDirectory("impskip").toString
    spark.sql(s"CREATE TABLE is_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$loc/in.csv"),
        "# generated by legacy tool\nid;name\n1;alpha\n2;beta\n")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        s"IMPORT INTO is_t FROM CSV FILE '$loc/in.csv' COLUMN SEPARATOR = ';' SKIP = 2")
      assert(ok, res.error)
      assert(res.rowsAffected.contains(2L))
      val rows = spark.table("is_t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((1L, "alpha"), (2L, "beta")))
    } finally spark.sql("DROP TABLE IF EXISTS is_t")
  }

  test("EXPORT guard never executes a side-effecting subquery") {
    val loc = Files.createTempDirectory("expguard").toString
    spark.sql(s"CREATE TABLE eg_t (id BIGINT) USING parquet LOCATION '$loc/t'")
    try {
      spark.sql("INSERT INTO eg_t VALUES (1)")
      val w = QueryWrapper(spark)
      w.onError = "continue"
      // A non-SELECT subquery is rejected by the guard WITHOUT running it
      // (r3 ADVICE: Try(spark.sql(cmd)) in canHandle executed the command
      // during dispatch — even when the guard then said no).
      val (ok, _) = w.query(
        s"EXPORT (INSERT INTO eg_t VALUES (99)) INTO CSV FILE '$loc/out'")
      assert(!ok)
      assert(spark.table("eg_t").count() == 1L) // the INSERT never ran
    } finally spark.sql("DROP TABLE IF EXISTS eg_t")
  }

  test("MERGE with empty target and source is a clean no-op") {
    val loc = Files.createTempDirectory("mrg3").toString
    spark.sql(s"CREATE TABLE mrg3_t (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/t'")
    spark.sql(s"CREATE TABLE mrg3_s (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/s'")
    try {
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        """MERGE INTO mrg3_t t USING mrg3_s s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
      assert(ok, res.error)
      assert(res.rowsAffected.contains(0L))
      assert(spark.table("mrg3_t").count() == 0L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS mrg3_t")
      spark.sql("DROP TABLE IF EXISTS mrg3_s")
    }
  }

  test("UPDATE on a missing table falls through to the error path") {
    val w = QueryWrapper(spark)
    w.onError = "continue"
    val (ok, res) = w.query("UPDATE no_such_table_xyz SET a = 1")
    assert(!ok)
    assert(res.error.isDefined)
  }

  test("CONNECT_BY_ROOT / SYS_CONNECT_BY_PATH / CONNECT_BY_ISLEAF") {
    import graft.SparkTestBase.spark.implicits._
    Seq((1L, Option.empty[Long], "ceo"), (2L, Some(1L), "vp_a"),
      (3L, Some(1L), "vp_b"), (4L, Some(2L), "eng"))
      .toDF("id", "mgr_id", "name").createOrReplaceTempView("cb_emp2")
    val w = QueryWrapper(spark)
    val (ok, res) = w.query(
      """SELECT name, CONNECT_BY_ROOT name AS root_name,
        |       SYS_CONNECT_BY_PATH(name, '/') AS pth,
        |       CONNECT_BY_ISLEAF AS lf, LEVEL
        |FROM cb_emp2
        |START WITH mgr_id IS NULL
        |CONNECT BY PRIOR id = mgr_id""".stripMargin)
    assert(ok, res.error)
    val rows = res.rows.map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getInt(3), r.getInt(4)))
      .toSet
    assert(rows == Set(
      ("ceo", "ceo", "/ceo", 0, 1),
      ("vp_a", "ceo", "/ceo/vp_a", 0, 2),
      ("vp_b", "ceo", "/ceo/vp_b", 1, 2),
      ("eng", "ceo", "/ceo/vp_a/eng", 1, 3)))
  }

  test("CONNECT BY with AND-ed compound condition filters child rows") {
    import graft.SparkTestBase.spark.implicits._
    Seq((1L, Option.empty[Long], "ceo"), (2L, Some(1L), "vp_a"),
      (3L, Some(1L), "vp_b"), (4L, Some(2L), "eng"))
      .toDF("id", "mgr_id", "name").createOrReplaceTempView("cb_emp3")
    val w = QueryWrapper(spark)
    // The PRIOR-free conjunct gates which CHILD rows may join (host-engine
    // semantics: unqualified columns in CONNECT BY are the current row).
    val (ok, res) = w.query(
      """SELECT name FROM cb_emp3
        |START WITH id = 1
        |CONNECT BY PRIOR id = mgr_id AND name <> 'vp_b'""".stripMargin)
    assert(ok, res.error)
    assert(res.rows.map(_.getString(0)).toSet == Set("ceo", "vp_a", "eng"))
    // A non-equality PRIOR conjunct joins parent-vs-child values:
    val (ok2, res2) = w.query(
      """SELECT name FROM cb_emp3
        |START WITH id = 1
        |CONNECT BY PRIOR id = mgr_id AND PRIOR id < id""".stripMargin)
    assert(ok2, res2.error)
    assert(res2.rows.map(_.getString(0)).toSet ==
      Set("ceo", "vp_a", "vp_b", "eng"))
  }

  test("NOCYCLE round-trip on a cyclic hierarchy with path and isleaf") {
    import graft.SparkTestBase.spark.implicits._
    // 1 -> 2 -> 3 -> 1 cycle (each row points at its parent).
    Seq((1L, 3L), (2L, 1L), (3L, 2L))
      .toDF("id", "parent").createOrReplaceTempView("cb_cyc")
    val w = QueryWrapper(spark)
    val (ok, res) = w.query(
      """SELECT id, SYS_CONNECT_BY_PATH(id, '/') AS pth,
        |       CONNECT_BY_ISLEAF AS lf, LEVEL
        |FROM cb_cyc
        |START WITH id = 1
        |CONNECT BY NOCYCLE PRIOR id = parent""".stripMargin)
    assert(ok, res.error)
    val rows = res.rows.map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    // Node 3's only candidate child (1) is already on its path -> leaf
    // UNDER NOCYCLE, not a loop; node 1 and 2 have real children.
    assert(rows == Set(
      (1L, "/1", 0, 1), (2L, "/1/2", 0, 2), (3L, "/1/2/3", 1, 3)))
  }

  test("IMPORT: multiple FILE clauses, NULL token, ENCODING, ROW SEPARATOR") {
    val loc = Files.createTempDirectory("impmf").toString
    spark.sql(s"CREATE TABLE mf_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"$loc/a.csv"), "1;alpha\n2;NULLTOK\n")
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"$loc/b.csv"), "3;gamma\n")
      val i = SqlCompat.parseImport(
        s"""IMPORT INTO mf_t FROM CSV FILE '$loc/a.csv' FILE '$loc/b.csv'
           |COLUMN SEPARATOR = ';' ENCODING = 'UTF-8' NULL = 'NULLTOK'
           |ROW SEPARATOR = 'CRLF'""".stripMargin).get
      assert(i.paths == Seq(s"$loc/a.csv", s"$loc/b.csv"))
      assert(i.nullValue.contains("NULLTOK") && i.encoding == "UTF-8")
      assert(i.lineSep.isEmpty) // CRLF = the reader's default splitting
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        s"IMPORT INTO mf_t FROM CSV FILE '$loc/a.csv' FILE '$loc/b.csv' " +
          "COLUMN SEPARATOR = ';' NULL = 'NULLTOK'")
      assert(ok, res.error)
      assert(res.rowsAffected.contains(3L))
      val rows = spark.table("mf_t").orderBy("id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      assert(rows.toSeq == Seq((1L, "alpha"), (2L, null), (3L, "gamma")))
    } finally spark.sql("DROP TABLE IF EXISTS mf_t")
  }

  test("IMPORT REJECT LIMIT: within passes, beyond fails before any write") {
    val loc = Files.createTempDirectory("imprl").toString
    spark.sql(s"CREATE TABLE rl_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$loc/in.csv"),
        "1;alpha\nbad1;x\nbad2;y\n")
      val w = QueryWrapper(spark)
      w.onError = "continue"
      val (ok, _) = w.query(
        s"IMPORT INTO rl_t FROM CSV FILE '$loc/in.csv' COLUMN SEPARATOR = ';' REJECT LIMIT 1")
      assert(!ok)
      assert(spark.table("rl_t").count() == 0L) // failed BEFORE the append
      val (ok2, res2) = w.query(
        s"IMPORT INTO rl_t FROM CSV FILE '$loc/in.csv' COLUMN SEPARATOR = ';' REJECT LIMIT 5")
      assert(ok2, res2.error)
      assert(res2.rowsAffected.contains(1L))
      // UNLIMITED spells the no-cap default:
      assert(SqlCompat.parseImport(
        "IMPORT INTO rl_t FROM CSV FILE '/x' REJECT LIMIT UNLIMITED")
        .get.rejectLimit.isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS rl_t")
  }

  test("EXPORT: existing path fails without REPLACE, REPLACE overwrites") {
    val loc = Files.createTempDirectory("expr").toString
    spark.sql(s"CREATE TABLE er_t (id BIGINT) USING parquet LOCATION '$loc/t'")
    try {
      spark.sql("INSERT INTO er_t VALUES (1), (2)")
      val w = QueryWrapper(spark)
      val (ok, _) = w.query(s"EXPORT er_t INTO CSV FILE '$loc/out'")
      assert(ok)
      w.onError = "continue"
      val (ok2, _) = w.query(s"EXPORT er_t INTO CSV FILE '$loc/out'")
      assert(!ok2) // host-engine semantics: existing target, no REPLACE
      val (ok3, res3) = w.query(s"EXPORT er_t INTO CSV FILE '$loc/out' REPLACE")
      assert(ok3, res3.error)
      assert(spark.read.csv(s"$loc/out").count() == 2L)
    } finally spark.sql("DROP TABLE IF EXISTS er_t")
  }

  test("EXPORT guard rejects a CTE-wrapped command without executing it") {
    val loc = Files.createTempDirectory("expg2").toString
    spark.sql(s"CREATE TABLE eg2_t (id BIGINT) USING parquet LOCATION '$loc/t'")
    try {
      spark.sql("INSERT INTO eg2_t VALUES (1)")
      val w = QueryWrapper(spark)
      w.onError = "continue"
      // r4 ADVICE: `WITH … INSERT` passed the SELECT/WITH prefix check and
      // Try(spark.sql) then EXECUTED it during dispatch. The parse-plan
      // guard must reject it unrun.
      val (ok, _) = w.query(
        s"EXPORT (WITH x AS (SELECT 99 AS id) INSERT INTO eg2_t SELECT id FROM x) " +
          s"INTO CSV FILE '$loc/out'")
      assert(!ok)
      assert(spark.table("eg2_t").count() == 1L) // the INSERT never ran
    } finally spark.sql("DROP TABLE IF EXISTS eg2_t")
  }

  test("IMPORT FROM FBV: fixed-width parse, blank->NULL, quarantine") {
    val loc = Files.createTempDirectory("impfbv").toString
    spark.sql(s"CREATE TABLE fbv_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      // 5-byte id + 6-byte name; row 3 has a non-numeric id (quarantines),
      // row 4 is short (quarantines), row 5 has an all-blank name (NULL).
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$loc/in.fbv"),
        "    1alpha \n    2beta  \nxxxxxgamma \nshort\n    5      \n")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        s"IMPORT INTO fbv_t FROM LOCAL FBV FILE '$loc/in.fbv' (SIZE=5, SIZE=6)")
      assert(ok, res.error)
      assert(res.rowsAffected.contains(3L))
      assert(w.messages.exists(m => m.msgType == "WARNING" &&
        m.message.contains("quarantined 2")))
      val rows = spark.table("fbv_t").orderBy("id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      assert(rows.toSeq == Seq((1L, "alpha"), (2L, "beta"), (5L, null)))
      // REJECT LIMIT caps quarantine like the CSV path:
      w.onError = "continue"
      val (ok2, _) = w.query(
        s"IMPORT INTO fbv_t FROM FBV FILE '$loc/in.fbv' (SIZE=5, SIZE=6) REJECT LIMIT 1")
      assert(!ok2)
    } finally spark.sql("DROP TABLE IF EXISTS fbv_t")
  }

  test("MERGE USING (subquery) parses, guards, and executes") {
    // Alias required for a subquery source; commands are rejected unrun.
    assert(SqlCompat.parseMerge(
      "MERGE INTO t USING (SELECT 1 AS id) ON t.id = s.id WHEN MATCHED THEN DELETE").isEmpty)
    val p = SqlCompat.parseMerge(
      """MERGE INTO tgt t USING (SELECT id, v * 2 AS v FROM src WHERE v > 0) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin).get
    assert(p.sourceIsQuery)
    assert(p.source == "SELECT id, v * 2 AS v FROM src WHERE v > 0")
    assert(p.sourceAlias == "s")

    val loc = Files.createTempDirectory("mrgq").toString
    spark.sql(s"CREATE TABLE mrgq_t (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/t'")
    spark.sql(s"CREATE TABLE mrgq_s (id BIGINT, v BIGINT) USING parquet LOCATION '$loc/s'")
    try {
      spark.sql("INSERT INTO mrgq_t VALUES (1, 10), (2, 20)")
      spark.sql("INSERT INTO mrgq_s VALUES (1, -5), (2, 100), (9, 90)")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        """MERGE INTO mrgq_t t
          |USING (SELECT id, v FROM mrgq_s WHERE v > 0) s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
      assert(ok, res.error)
      assert(res.rowsAffected.contains(2L)) // id=2 updated, id=9 inserted
      val rows = spark.table("mrgq_t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // id=1 untouched: the filtered source excludes its v=-5 row.
      assert(rows.toSeq == Seq((1L, 10L), (2L, 100L), (9L, 90L)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mrgq_t")
      spark.sql("DROP TABLE IF EXISTS mrgq_s")
    }
  }

  test("GROUP_CONCAT translates to listagg (DISTINCT/ORDER BY/SEPARATOR)") {
    assert(SqlCompat.translateGroupConcat(
      "SELECT g, GROUP_CONCAT(name) FROM t GROUP BY g") ==
      "SELECT g, listagg(name, ',') FROM t GROUP BY g")
    assert(SqlCompat.translateGroupConcat(
      "SELECT GROUP_CONCAT(DISTINCT name ORDER BY name DESC SEPARATOR '; ') FROM t") ==
      "SELECT listagg(DISTINCT name, '; ') WITHIN GROUP (ORDER BY name DESC) FROM t")
    // Inside a string literal: untouched.
    val lit = "SELECT 'use GROUP_CONCAT(x)' AS doc FROM t"
    assert(SqlCompat.translateGroupConcat(lit) == lit)

    import graft.SparkTestBase.spark.implicits._
    Seq(("a", "z"), ("a", "y"), ("b", "x"), ("a", "y"))
      .toDF("g", "v").createOrReplaceTempView("gc_t")
    val w = QueryWrapper(spark)
    val (ok, res) = w.query(
      """SELECT g, GROUP_CONCAT(v ORDER BY v SEPARATOR '|') AS cs,
        |       GROUP_CONCAT(DISTINCT v) AS ds
        |FROM gc_t GROUP BY g ORDER BY g""".stripMargin)
    assert(ok, res.error)
    val rows = res.rows.map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.head == (("a", "y|y|z", rows.head._3)))
    assert(Set("y,z", "z,y").contains(rows.head._3)) // DISTINCT order free
    assert(rows(1) == (("b", "x", "x")))
  }

  test("IMPORT ERRORS INTO: rejected raw lines land in the errors table") {
    val dir = java.nio.file.Files.createTempDirectory("err_into").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      "1,a\n2,b\nnot-a-number,c\n")
    spark.sql("DROP TABLE IF EXISTS ei2_t")
    spark.sql("DROP TABLE IF EXISTS ei2_err")
    spark.sql("CREATE TABLE ei2_t (id BIGINT, name STRING) USING parquet")
    try {
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        s"IMPORT INTO ei2_t FROM CSV FILE '$dir/in.csv' ERRORS INTO ei2_err")
      assert(ok, res.error)
      assert(res.rowsAffected.contains(2L))
      val errs = spark.table("ei2_err").collect().map(_.getString(0)).toSeq
      assert(errs == Seq("not-a-number,c"))
      // a clean re-import appends nothing to the errors table
      val (ok2, _) = w.query(
        s"IMPORT INTO ei2_t FROM CSV FILE '$dir/in.csv' " +
          "ERRORS INTO ei2_err REJECT LIMIT 5")
      assert(ok2)
      assert(spark.table("ei2_err").count() == 2L) // same bad line again
    } finally {
      spark.sql("DROP TABLE IF EXISTS ei2_t")
      spark.sql("DROP TABLE IF EXISTS ei2_err")
    }
  }

  test("IMPORT/EXPORT PARQUET: round-trip, REPLACE guard, by-name cast") {
    val sql = graft.SparkTestBase.spark
    import sql.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_ie").toString
    spark.sql("DROP TABLE IF EXISTS pq_t")
    spark.sql("CREATE TABLE pq_t (id BIGINT, name STRING) USING parquet")
    try {
      val w = QueryWrapper(spark)
      // seed + export
      spark.sql("INSERT INTO pq_t VALUES (1, 'a'), (2, 'b')")
      val (ok1, r1) = w.query(s"EXPORT pq_t INTO PARQUET FILE '$dir/out'")
      assert(ok1 && r1.rowsAffected.contains(2L))
      // existing path fails without REPLACE, REPLACE overwrites
      w.onError = "continue"
      val (ok2, _) = w.query(s"EXPORT pq_t INTO PARQUET FILE '$dir/out'")
      assert(!ok2)
      val (ok3, _) = w.query(
        s"EXPORT (SELECT id, name FROM pq_t WHERE id = 1) " +
          s"INTO PARQUET FILE '$dir/out' REPLACE")
      assert(ok3)
      // import appends with by-name alignment + cast (id written as INT)
      Seq((7, "z")).toDF("id", "name").write
        .parquet(s"$dir/in") // INT id -> cast to BIGINT on import
      val (ok4, r4) = w.query(
        s"IMPORT INTO pq_t FROM PARQUET FILE '$dir/in'")
      assert(ok4, r4.error)
      assert(r4.rowsAffected.contains(1L))
      val rows = spark.table("pq_t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a"), (2L, "b"), (7L, "z")))
    } finally spark.sql("DROP TABLE IF EXISTS pq_t")
  }

  test("RATIO_TO_REPORT translates to a SUM window division") {
    assert(SqlCompat.translateRatioToReport(
      "SELECT g, RATIO_TO_REPORT(x) OVER (PARTITION BY g) AS r FROM t") ==
      "SELECT g, ((x) / SUM(x) OVER (PARTITION BY g)) AS r FROM t")
    // Empty OVER: share of the whole result set.
    assert(SqlCompat.translateRatioToReport(
      "SELECT RATIO_TO_REPORT(v) OVER () FROM t") ==
      "SELECT ((v) / SUM(v) OVER ()) FROM t")
    // Computed argument keeps its parens; nested parens in OVER survive.
    assert(SqlCompat.translateRatioToReport(
      "SELECT ratio_to_report(a + f(b)) OVER (PARTITION BY g(h, i)) FROM t")
      == "SELECT ((a + f(b)) / SUM(a + f(b)) OVER (PARTITION BY g(h, i))) FROM t")
    // No OVER clause (invalid in Exasol too): untouched.
    val noOver = "SELECT RATIO_TO_REPORT(x) FROM t"
    assert(SqlCompat.translateRatioToReport(noOver) == noOver)
    // Inside a string literal: untouched.
    val lit = "SELECT 'see RATIO_TO_REPORT(x) OVER ()' AS doc FROM t"
    assert(SqlCompat.translateRatioToReport(lit) == lit)

    import graft.SparkTestBase.spark.implicits._
    Seq(("a", 1L), ("a", 3L), ("b", 6L))
      .toDF("g", "v").createOrReplaceTempView("rtr_t")
    val w = QueryWrapper(spark)
    val (ok, res) = w.query(
      """SELECT g, v,
        |       CAST(FLOOR(RATIO_TO_REPORT(v) OVER (PARTITION BY g)
        |                  * 100 + 0.5) AS BIGINT) AS pct
        |FROM rtr_t ORDER BY g, v""".stripMargin)
    assert(ok, res.error)
    assert(res.rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("a", 1L, 25L), ("a", 3L, 75L), ("b", 6L, 100L)))
  }

  test("PREFERRING translation: shape, WHERE replication, guarded negatives") {
    val out = SqlCompat.translatePreferring(
      "SELECT a, b FROM t PREFERRING HIGH a PLUS LOW b ORDER BY a")
    assert(out.isDefined)
    val sql = out.get
    assert(sql.contains("NOT EXISTS"))
    assert(sql.contains("__sky1.a >= __sky0.a"))
    assert(sql.contains("__sky1.b <= __sky0.b"))
    assert(sql.contains("__sky1.a > __sky0.a OR __sky1.b < __sky0.b"))
    assert(sql.trim.endsWith("ORDER BY a"))
    // WHERE is replicated into the dominance subquery
    val withWhere = SqlCompat.translatePreferring(
      "SELECT a FROM t WHERE a > 3 PREFERRING HIGH a").get
    assert(withWhere.contains("__sky0 WHERE (a > 3) AND NOT EXISTS"))
    assert(withWhere.contains("__sky1 WHERE (a > 3) AND"))
    // negatives: keyword inside a string literal; subquery source;
    // unsupported term form; GROUP BY between table and PREFERRING
    assert(SqlCompat.translatePreferring(
      "SELECT 'PREFERRING HIGH x' AS s FROM t").isEmpty)
    assert(SqlCompat.translatePreferring(
      "SELECT * FROM (SELECT 1) PREFERRING HIGH x").isEmpty)
    assert(SqlCompat.translatePreferring(
      "SELECT * FROM t PREFERRING HIGH a PRIOR TO LOW b").isEmpty)
    assert(SqlCompat.translatePreferring(
      "SELECT a FROM t GROUP BY a PREFERRING HIGH a").isEmpty)
    assert(SqlCompat.translatePreferring(
      "SELECT a FROM t WHERE a > 1").isEmpty)
  }
}
