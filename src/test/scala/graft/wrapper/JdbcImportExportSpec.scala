package graft.wrapper

import java.nio.file.Files
import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** IMPORT/EXPORT … JDBC + CREATE CONNECTION (VERDICT r8 #4): the host
  * engine's external-database lane behind the same statement grammar as the
  * CSV/FBV forms, re-expressed as spark.read.jdbc / df.write.jdbc. Tested
  * against embedded Derby (ships with Spark's jars — no new dependency).
  */
class JdbcImportExportSpec extends AnyFunSuite with SparkTestBase {

  // Keep Derby's home (derby.log etc.) out of the repo tree.
  System.setProperty("derby.system.home",
    Files.createTempDirectory("derby-home").toString)

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withRemote[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def freshRemoteTable(name: String, rows: Seq[(Int, String)]): Unit =
    withRemote { c =>
      val st = c.createStatement()
      try st.execute(s"DROP TABLE $name") catch { case _: Exception => () }
      st.execute(s"CREATE TABLE $name (id INT, name VARCHAR(64))")
      val ps = c.prepareStatement(s"INSERT INTO $name VALUES (?, ?)")
      rows.foreach { case (i, n) => ps.setInt(1, i); ps.setString(2, n); ps.addBatch() }
      ps.executeBatch()
      st.close(); ps.close()
    }

  test("parseJdbcImport: inline URL, TABLE and STATEMENT forms") {
    val i = SqlCompat.parseJdbcImport(
      "IMPORT INTO t FROM JDBC AT 'jdbc:derby:memory:x' TABLE remote_t").get
    assert(i.table == "t" && i.at.url == "jdbc:derby:memory:x")
    assert(i.source == Left("remote_t"))
    val s = SqlCompat.parseJdbcImport(
      "IMPORT INTO t FROM JDBC AT 'u' USER 'sa' IDENTIFIED BY 'pw' " +
        "STATEMENT 'SELECT * FROM a WHERE x = ''y''' STATEMENT 'SELECT * FROM b'").get
    assert(s.at.user.contains("sa") && s.at.password.contains("pw"))
    assert(s.source == Right(Seq("SELECT * FROM a WHERE x = 'y'", "SELECT * FROM b")))
    // CSV import must not match the JDBC grammar and vice versa.
    assert(SqlCompat.parseJdbcImport("IMPORT INTO t FROM CSV FILE '/x'").isEmpty)
    assert(SqlCompat.parseImport("IMPORT INTO t FROM JDBC AT 'u' TABLE s").isEmpty)
  }

  test("CREATE/DROP CONNECTION registry semantics") {
    assert(SqlCompat.handleConnectionDdl(
      "CREATE CONNECTION conn_a TO 'jdbc:derby:memory:a' USER 'u1' IDENTIFIED BY 'p1'"))
    assert(SqlCompat.lookupConnection("conn_a")
      .exists(c => c.url == "jdbc:derby:memory:a" && c.user.contains("u1")))
    // duplicate without OR REPLACE fails; with it, overwrites
    intercept[IllegalArgumentException] {
      SqlCompat.handleConnectionDdl("CREATE CONNECTION conn_a TO 'other'")
    }
    assert(SqlCompat.handleConnectionDdl(
      "CREATE OR REPLACE CONNECTION conn_a TO 'jdbc:derby:memory:b'"))
    assert(SqlCompat.lookupConnection("CONN_A").exists(_.url == "jdbc:derby:memory:b"))
    assert(SqlCompat.handleConnectionDdl("DROP CONNECTION conn_a"))
    assert(SqlCompat.lookupConnection("conn_a").isEmpty)
    intercept[IllegalArgumentException] {
      SqlCompat.handleConnectionDdl("DROP CONNECTION conn_a")
    }
    assert(SqlCompat.handleConnectionDdl("DROP CONNECTION IF EXISTS conn_a"))
    // non-connection statements fall through
    assert(!SqlCompat.handleConnectionDdl("SELECT 1"))
  }

  test("IMPORT FROM JDBC TABLE via a named connection, through the wrapper") {
    freshRemoteTable("src_t", Seq(1 -> "ann", 2 -> "bob", 3 -> "cat"))
    val loc = Files.createTempDirectory("jdbc-imp").toString
    spark.sql(s"CREATE TABLE ji_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      val w = QueryWrapper(spark)
      val (ok0, _) = w.query(s"CREATE CONNECTION derby_c TO '$url'")
      assert(ok0)
      val (ok, res) = w.query("IMPORT INTO ji_t FROM JDBC AT derby_c TABLE src_t")
      assert(ok)
      assert(res.rowsAffected.contains(3L))
      val rows = spark.table("ji_t").orderBy("id").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "ann"), (2L, "bob"), (3L, "cat")))
      // position-mapped with cast: remote INT landed in a BIGINT column
      assert(spark.table("ji_t").schema("id").dataType ==
        org.apache.spark.sql.types.LongType)
    } finally {
      spark.sql("DROP TABLE ji_t")
      QueryWrapper(spark).query("DROP CONNECTION IF EXISTS derby_c")
    }
  }

  test("EXA/ORA loader forms alias the JDBC lane (grammar + end-to-end)") {
    // grammar: all three source types parse to the same JdbcImport shape
    val exa = SqlCompat.parseJdbcImport(
      "IMPORT INTO t FROM EXA AT 'jdbc:exa:host:8563' TABLE remote_t").get
    assert(exa.at.url == "jdbc:exa:host:8563" && exa.source == Left("remote_t"))
    val ora = SqlCompat.parseJdbcExport(
      "EXPORT t INTO ORA AT 'jdbc:oracle:thin:@h:1521' TABLE tgt").get
    assert(ora.at.url == "jdbc:oracle:thin:@h:1521" && ora.target == "tgt")
    // end-to-end: EXA spelling against the embedded endpoint behaves
    // exactly like the JDBC spelling
    freshRemoteTable("src_e", Seq(7 -> "gus", 8 -> "hal"))
    val loc = Files.createTempDirectory("exa-imp").toString
    spark.sql(
      s"CREATE TABLE ei_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      val w = QueryWrapper(spark)
      assert(w.query(s"CREATE CONNECTION exa_c TO '$url'")._1)
      val (ok, res) = w.query("IMPORT INTO ei_t FROM EXA AT exa_c TABLE src_e")
      assert(ok, res.errorMessage)
      assert(res.rowsAffected.contains(2L))
      assert(spark.table("ei_t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((7L, "gus"), (8L, "hal")))
    } finally {
      spark.sql("DROP TABLE ei_t")
      QueryWrapper(spark).query("DROP CONNECTION IF EXISTS exa_c")
    }
  }

  test("IMPORT FROM JDBC with parallel STATEMENT cursors") {
    freshRemoteTable("src_p", (1 to 10).map(i => i -> s"n$i"))
    val loc = Files.createTempDirectory("jdbc-imp2").toString
    spark.sql(s"CREATE TABLE jp_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        s"""IMPORT INTO jp_t FROM JDBC AT '$url'
           |STATEMENT 'SELECT id, name FROM src_p WHERE MOD(id, 2) = 0'
           |STATEMENT 'SELECT id, name FROM src_p WHERE MOD(id, 2) = 1'""".stripMargin)
      assert(ok, res.error.map(_.message).getOrElse(""))
      assert(res.rowsAffected.contains(10L))
      assert(spark.table("jp_t").select("id").distinct().count() == 10L)
    } finally spark.sql("DROP TABLE jp_t")
  }

  test("EXPORT INTO JDBC: table append, query, and TRUNCATE re-export") {
    val loc = Files.createTempDirectory("jdbc-exp").toString
    spark.sql(s"CREATE TABLE je_t (id BIGINT, name STRING) USING parquet LOCATION '$loc/t'")
    try {
      spark.sql("INSERT INTO je_t VALUES (1, 'x'), (2, 'y')")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(s"EXPORT je_t INTO JDBC AT '$url' TABLE dst_t")
      assert(ok, res.error.map(_.message).getOrElse(""))
      assert(res.rowsAffected.contains(2L))
      withRemote { c =>
        val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM dst_t")
        rs.next(); assert(rs.getInt(1) == 2)
      }
      // plain re-export appends (host default)
      assert(w.query(s"EXPORT je_t INTO JDBC AT '$url' TABLE dst_t")._1)
      withRemote { c =>
        val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM dst_t")
        rs.next(); assert(rs.getInt(1) == 4)
      }
      // TRUNCATE empties the remote table first, keeping its DDL
      val (ok3, res3) = w.query(
        s"EXPORT (SELECT id + 10 AS id, name FROM je_t) INTO JDBC AT '$url' TABLE dst_t TRUNCATE")
      assert(ok3, res3.error.map(_.message).getOrElse(""))
      withRemote { c =>
        // Spark's JDBC writer created dst_t with quoted lowercase columns
        val rs = c.createStatement()
          .executeQuery("SELECT MIN(\"id\"), COUNT(*) FROM dst_t")
        rs.next(); assert(rs.getInt(1) == 11 && rs.getInt(2) == 2)
      }
    } finally spark.sql("DROP TABLE je_t")
  }

  test("a poisoned source row quarantines into ERRORS INTO instead of " +
      "failing the load; REJECT LIMIT caps it") {
    // Remote rows land by POSITION with a cast: 'abc' cannot cast to the
    // target INT column — under ANSI that would fail the whole scan; the
    // quarantine lane routes the row to the errors table instead (the CSV
    // lane's semantics, r9 verdict #4).
    withRemote { c =>
      val st = c.createStatement()
      try st.execute("DROP TABLE src_q") catch { case _: Exception => () }
      st.execute("CREATE TABLE src_q (id INT, amount VARCHAR(16))")
      st.execute("INSERT INTO src_q VALUES (1, '10'), (2, 'abc'), (3, '30')")
      st.close()
    }
    val loc = Files.createTempDirectory("jdbc-quar").toString
    spark.sql(s"CREATE TABLE jq_t (id BIGINT, amount INT) USING parquet LOCATION '$loc/t'")
    spark.sql(s"CREATE TABLE jq_e (raw_record STRING) USING parquet LOCATION '$loc/e'")
    try {
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        s"IMPORT INTO jq_t FROM JDBC AT '$url' TABLE src_q " +
          "ERRORS INTO jq_e REJECT LIMIT 5")
      assert(ok, res.error.map(_.message).getOrElse(""))
      assert(res.rowsAffected.contains(2L)) // loaded = good rows only
      assert(spark.table("jq_t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq ==
        Seq((1L, 10), (3L, 30)))
      // the poisoned ROW (json of the full source row) is in the errors table
      val errs = spark.table("jq_e").collect().map(_.getString(0))
      assert(errs.length == 1 && errs.head.contains("abc"), errs.toSeq)
      // the quarantine was logged on the wrapper
      assert(w.messages.exists(m =>
        m.msgType == "WARNING" && m.message.contains("quarantined 1")))

      // REJECT LIMIT 0 fails the statement BEFORE any write
      val w2 = QueryWrapper(spark)
      w2.onError = "continue"
      val before = spark.table("jq_t").count()
      val (ok2, res2) = w2.query(
        s"IMPORT INTO jq_t FROM JDBC AT '$url' TABLE src_q REJECT LIMIT 0")
      assert(!ok2)
      assert(res2.error.exists(_.message.contains("REJECT LIMIT")))
      assert(spark.table("jq_t").count() == before)
    } finally {
      spark.sql("DROP TABLE jq_t"); spark.sql("DROP TABLE jq_e")
    }
  }

  test("IMPORT FROM JDBC into a hive-partitioned target appends only the " +
      "touched partitions") {
    def fileState(dir: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(dir)
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.isFile).filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    withRemote { c =>
      val st = c.createStatement()
      try st.execute("DROP TABLE src_part") catch { case _: Exception => () }
      st.execute("CREATE TABLE src_part (id INT, name VARCHAR(16), day INT)")
      st.execute("INSERT INTO src_part VALUES (20, 'new2', 2)")
      st.close()
    }
    val loc = Files.createTempDirectory("jdbc-part").toString + "/t"
    spark.sql("CREATE TABLE jpt (id BIGINT, name STRING, day INT) " +
      s"USING parquet PARTITIONED BY (day) LOCATION '$loc'")
    try {
      spark.sql(
        "INSERT INTO jpt VALUES (1, 'a', 0), (2, 'b', 1), (3, 'c', 2)")
      val before0 = fileState(s"$loc/day=0")
      val before1 = fileState(s"$loc/day=1")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(
        s"IMPORT INTO jpt FROM JDBC AT '$url' TABLE src_part")
      assert(ok, res.error.map(_.message).getOrElse(""))
      assert(res.rowsAffected.contains(1L))
      // remote rows reached only their own partition; day 0/1 files
      // stayed byte-identical (append, never a full overwrite)
      assert(fileState(s"$loc/day=0") == before0)
      assert(fileState(s"$loc/day=1") == before1)
      assert(spark.table("jpt").filter("day = 2").count() == 2L)
    } finally spark.sql("DROP TABLE jpt")
  }

  test("loader clauses inside a STATEMENT literal are TEXT, not options") {
    // "reject limit 0" / "errors into x" / "table y" appearing inside the
    // remote query literal must not be parsed as loader clauses.
    val i = SqlCompat.parseJdbcImport(
      "IMPORT INTO t FROM JDBC AT 'jdbc:derby:memory:x' " +
        "STATEMENT 'SELECT v FROM r WHERE note = ''reject limit 0'' " +
        "AND tag <> ''errors into trap'' AND src <> ''table trap'''").get
    assert(i.rejectLimit.isEmpty, i.rejectLimit)
    assert(i.errorsInto.isEmpty, i.errorsInto)
    assert(i.source.isRight && i.source.toOption.get.head.contains("reject limit 0"))
    // real clauses OUTSIDE the literal still parse
    val j = SqlCompat.parseJdbcImport(
      "IMPORT INTO t FROM JDBC AT 'u' STATEMENT 'SELECT 1' " +
        "ERRORS INTO errs REJECT LIMIT 7").get
    assert(j.rejectLimit.contains(7L) && j.errorsInto.contains("errs"))
  }

  test("column-count mismatch fails the statement before any write") {
    freshRemoteTable("src_m", Seq(1 -> "a"))
    val loc = Files.createTempDirectory("jdbc-mis").toString
    spark.sql(s"CREATE TABLE jm_t (id BIGINT) USING parquet LOCATION '$loc/t'")
    try {
      val w = QueryWrapper(spark)
      w.onError = "continue"
      val (ok, res) = w.query("IMPORT INTO jm_t FROM JDBC AT '" + url + "' TABLE src_m")
      assert(!ok)
      assert(res.error.exists(_.message.contains("column")))
      assert(spark.table("jm_t").count() == 0L)
    } finally spark.sql("DROP TABLE jm_t")
  }
}
