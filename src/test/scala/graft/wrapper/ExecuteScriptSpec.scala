package graft.wrapper

import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** `EXECUTE SCRIPT name(args)` as SQL text (reference RM:35–37, 69) —
  * the B16 story end-to-end: a registered multi-step job dispatched from
  * `wrapper.query`, its own job_log registration, golden-checked
  * job_details rows, literal-argument binding, and host-style fallthrough
  * for unregistered names. */
class ExecuteScriptSpec extends AnyFunSuite with SparkTestBase {

  private val clock: () => Instant = () => Instant.parse("2026-01-02T03:04:05Z")

  test("a registered multi-step job runs end-to-end through SQL text") {
    val dir = Files.createTempDirectory("exec_script").toString
    val store = new LogStore(spark, dir, clock)
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .createOrReplaceTempView("es_region")
    ScriptRegistry.register("etl.load_regions") { args =>
      val minKey = args.head.asInstanceOf[Long]
      val tag = args(1).asInstanceOf[String]
      Seq(
        "count_regions" -> (w => w.query(
          "SELECT count(*) FROM es_region WHERE r_regionkey >= :MINKEY",
          QueryOptions(params = Some(Map("MINKEY" -> minKey))))),
        "note" -> (w => w.log("MY_LOG", s"tagged $tag")))
    }
    try {
      val outer = QueryWrapper(spark, Some(store), "outer_job", clock)
      val (ok, res) = outer.query(
        "EXECUTE SCRIPT etl.load_regions(2, 'it''s nightly')")
      assert(ok, res.error)
      // The statement's result is the script's messages table
      // (RETURNS TABLE analog): START/INFO per step + the custom level.
      val msgs = res.dataFrame.get.collect().map(r => (r.getString(2), r.getString(3)))
      assert(msgs.exists(_ == ("START", "Entering function count_regions")))
      assert(msgs.exists(_ == ("INFO", "Finished function count_regions")))
      // the '' escape reached the step as a single quote
      assert(msgs.exists(_ == ("MY_LOG", "tagged it's nightly")))

      // Golden job_details: the script ran as its OWN registered job in
      // the SHARED log store (the host engine's job_log shape).
      val details = store.jobDetails.orderBy("detail_id").collect()
        .map(r => (r.getLong(1), r.getString(3), r.getString(4)))
      val scriptRuns = store.jobLog.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      assert(scriptRuns.exists { case (_, name, status) =>
        name == "etl.load_regions" && status == "FINISHED SUCCESSFULLY" })
      val runId = scriptRuns
        .find(_._2 == "etl.load_regions").get._1
      val scriptDetails = details.filter(_._1 == runId).map(d => (d._2, d._3))
      assert(scriptDetails.contains(("START", "Entering function count_regions")))
      assert(scriptDetails.contains(("MY_LOG", "tagged it's nightly")))
      outer.finish()
    } finally ScriptRegistry.drop("etl.load_regions")
  }

  test("name lookup is case-insensitive and argument-free calls work") {
    ScriptRegistry.register("NOARG.JOB") { _ =>
      Seq("only" -> (w => w.log("L", "ran")))
    }
    try {
      val w = QueryWrapper(spark, None, "outer2", clock)
      val (ok1, r1) = w.query("EXECUTE SCRIPT noarg.job()")
      val (ok2, r2) = w.query("EXECUTE SCRIPT noarg.job")
      assert(ok1 && ok2)
      assert(r1.dataFrame.get.collect().exists(_.getString(3) == "ran"))
      assert(r2.dataFrame.get.collect().exists(_.getString(3) == "ran"))
    } finally ScriptRegistry.drop("NOARG.JOB")
  }

  test("literal binding covers numbers, decimals, booleans and NULL") {
    @volatile var seen: Seq[Any] = null
    ScriptRegistry.register("argcheck") { args =>
      seen = args
      Seq("noop" -> (w => w.log("L", "ok")))
    }
    try {
      val w = QueryWrapper(spark, None, "outer3", clock)
      val (ok, _) = w.query(
        "EXECUTE SCRIPT argcheck(-5, 2.5, TRUE, false, NULL, 'x')")
      assert(ok)
      assert(seen == Seq(-5L, 2.5, true, false, null, "x"))
    } finally ScriptRegistry.drop("argcheck")
  }

  test("an unregistered script name falls through to the host-style error") {
    val w = QueryWrapper(spark, None, "outer4", clock)
    w.onError = "continue"
    val (ok, res) = w.query("EXECUTE SCRIPT no.such_script(1)")
    assert(!ok)
    assert(res.error.isDefined)
    // ... even with a NON-LITERAL argument: the dispatch guard must not
    // throw on the argument text before concluding the name is
    // unregistered (it falls through to spark.sql's parse error, not an
    // unsupported-literal error)
    val (ok2, res2) = w.query("EXECUTE SCRIPT no.such_script(some_ident)")
    assert(!ok2)
    assert(res2.error.isDefined)
    assert(!res2.errorMessage.contains("unsupported argument literal"),
      res2.errorMessage)
  }

  test("a REGISTERED script with a malformed literal fails through the " +
      "wrapper's query-failure path with the clear literal error") {
    ScriptRegistry.register("litcheck") { _ =>
      Seq("noop" -> (w => w.log("L", "ok")))
    }
    try {
      val w = QueryWrapper(spark, None, "outer6", clock)
      w.onError = "continue"
      val (ok, res) = w.query("EXECUTE SCRIPT litcheck(bad_ident)")
      assert(!ok)
      assert(res.errorMessage.contains("unsupported argument literal"),
        res.errorMessage)
    } finally ScriptRegistry.drop("litcheck")
  }

  test("CREATE SCRIPT then EXECUTE SCRIPT works from SQL text alone — no " +
      "Scala registration (VERDICT r10 #4)") {
    val dir = Files.createTempDirectory("create_script").toString
    val store = new LogStore(spark, dir, clock)
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .createOrReplaceTempView("cs_region")
    try {
      val w = QueryWrapper(spark, Some(store), "ddl_outer", clock)
      // Parameterized two-step SQL body; the trailing EXAplus `/` line
      // and RETURNS TABLE clause are accepted like the host engine's
      // own install DDL (query_wrapper.sql:22).
      val (okC, _) = w.query(
        """CREATE SCRIPT etl.count_regions (minkey) RETURNS TABLE AS
          |  SELECT count(*) AS cnt FROM cs_region
          |  WHERE r_regionkey >= :MINKEY;
          |  SELECT max(r_regionkey) FROM cs_region
          |/""".stripMargin)
      assert(okC)
      val (okE, res) = w.query("EXECUTE SCRIPT etl.count_regions(2)")
      assert(okE, res.error)
      val msgs = res.dataFrame.get.collect().map(_.getString(3))
      assert(msgs.exists(_ == "Entering function bind_params"))
      assert(msgs.exists(_ == "Entering function step_1"))
      assert(msgs.exists(_ == "Entering function step_2"))
      assert(store.jobLog.collect().exists(r =>
        r.getString(1) == "etl.count_regions" &&
          r.getString(2) == "FINISHED SUCCESSFULLY"))
      // wrong arity raises the clear parameter-count error
      w.onError = "continue"
      val (okA, resA) = w.query("EXECUTE SCRIPT etl.count_regions(1, 2)")
      assert(!okA)
      assert(resA.errorMessage.contains("expects 1 argument"),
        resA.errorMessage)
      // CREATE without OR REPLACE on an existing name raises; OR REPLACE
      // replaces (new body visible on the next execute)
      val (okDup, resDup) = w.query(
        "CREATE SCRIPT etl.count_regions AS SELECT 1")
      assert(!okDup)
      assert(resDup.errorMessage.contains("already exists"),
        resDup.errorMessage)
      val (okRep, _) = w.query(
        "CREATE OR REPLACE SCRIPT etl.count_regions () AS " +
          "SELECT 41 + 1 AS answer")
      assert(okRep)
      val (okE2, res2) = w.query("EXECUTE SCRIPT etl.count_regions()")
      assert(okE2)
      assert(res2.dataFrame.get.collect()
        .exists(_.getString(3) == "Entering function step_1"))
      // DROP SCRIPT removes it; the next EXECUTE falls through to the
      // host-style unregistered error; IF EXISTS tolerates the gone name
      val (okD, _) = w.query("DROP SCRIPT etl.count_regions")
      assert(okD)
      val (okGone, _) = w.query("EXECUTE SCRIPT etl.count_regions()")
      assert(!okGone)
      val (okIfEx, _) = w.query("DROP SCRIPT IF EXISTS etl.count_regions")
      assert(okIfEx)
      val (okDropMissing, resDM) = w.query("DROP SCRIPT never.there")
      assert(!okDropMissing)
      assert(resDM.errorMessage.contains("does not exist"))
    } finally ScriptRegistry.drop("etl.count_regions")
  }

  test("scripts and connections survive a session restart via the durable " +
      "catalog; DROP and REPLACE are durable too (VERDICT r11 #3)") {
    val dir = Files.createTempDirectory("durable_catalog").toString
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .createOrReplaceTempView("dc_region")
    def freshWrapper() =
      QueryWrapper(spark, Some(new LogStore(spark, dir, clock)), "dc", clock)
    def simulateRestart(): Unit = {
      // Driver-memory registries (and the hydrated-roots memo) die with
      // the JVM; the warehouse tables under `dir` survive. Clearing ONLY
      // the memory side reproduces a fresh process against the same
      // warehouse.
      ScriptRegistry.drop("etl.durable_job")
      SqlCompat.forgetConnection("DC_CONN")
      DurableCatalog.resetHydration(dir)
      assert(ScriptRegistry.lookup("etl.durable_job").isEmpty)
    }
    try {
      val w1 = freshWrapper()
      val (okS, _) = w1.query(
        """CREATE SCRIPT etl.durable_job (minkey) AS
          |  SELECT count(*) AS cnt FROM dc_region
          |  WHERE r_regionkey >= :MINKEY""".stripMargin)
      assert(okS)
      val (okC, _) = w1.query(
        "CREATE CONNECTION dc_conn TO 'jdbc:derby:memory:dcat' " +
          "USER 'app' IDENTIFIED BY 'secret'")
      assert(okC)

      simulateRestart()
      val w2 = freshWrapper() // init() rehydrates from dir
      val conn = SqlCompat.lookupConnection("DC_CONN")
      assert(conn.contains(SqlCompat.Connection(
        "jdbc:derby:memory:dcat", Some("app"), Some("secret"))))
      val (okE, res) = w2.query("EXECUTE SCRIPT etl.durable_job(2)")
      assert(okE, res.error)
      assert(res.dataFrame.get.collect()
        .exists(_.getString(3) == "Entering function step_1"))

      // OR REPLACE updates the STORED body: replace, restart, execute.
      val (okR, _) = w2.query(
        "CREATE OR REPLACE SCRIPT etl.durable_job () AS SELECT 42 AS answer")
      assert(okR)
      simulateRestart()
      val w3 = freshWrapper()
      val (okE2, res2) = w3.query("EXECUTE SCRIPT etl.durable_job()")
      assert(okE2, res2.error)

      // DROP is durable: gone from the store, so a restart cannot
      // resurrect it; same for the connection.
      assert(okDrop(w3, "DROP SCRIPT etl.durable_job"))
      assert(okDrop(w3, "DROP CONNECTION dc_conn"))
      simulateRestart()
      val w4 = freshWrapper()
      w4.onError = "continue"
      val (okGone, _) = w4.query("EXECUTE SCRIPT etl.durable_job()")
      assert(!okGone)
      assert(SqlCompat.lookupConnection("DC_CONN").isEmpty)
    } finally {
      ScriptRegistry.drop("etl.durable_job")
      SqlCompat.forgetConnection("DC_CONN")
    }
  }

  test("a stored catalog row the in-memory registry never saw is still " +
      "droppable (no resurrection at the next restart)") {
    val dir = Files.createTempDirectory("durable_catalog_skew").toString
    def freshWrapper() =
      QueryWrapper(spark, Some(new LogStore(spark, dir, clock)), "dcs", clock)
    try {
      val w1 = freshWrapper()
      assert(w1.query("CREATE SCRIPT etl.skew_job () AS SELECT 1 AS one")._1)
      assert(w1.query("CREATE CONNECTION skew_conn TO 'jdbc:x'")._1)
      // Registry drift: something else in the JVM (e.g. a no-catalog
      // wrapper sharing the global registries) removes the MEMORY entries
      // while the warehouse rows survive — and hydration has already run
      // for this root, so a fresh wrapper will NOT re-read them.
      ScriptRegistry.drop("etl.skew_job")
      SqlCompat.forgetConnection("SKEW_CONN")
      val w2 = freshWrapper()
      // A memory-gated write-through would throw "does not exist" here
      // and leave the rows to resurrect at the next restart:
      assert(w2.query("DROP SCRIPT etl.skew_job")._1)
      assert(w2.query("DROP CONNECTION skew_conn")._1)
      DurableCatalog.resetHydration(dir)
      val w3 = freshWrapper() // restart: rehydrates from the store
      assert(ScriptRegistry.lookup("etl.skew_job").isEmpty)
      assert(SqlCompat.lookupConnection("SKEW_CONN").isEmpty)
      w3.finish()
    } finally {
      ScriptRegistry.drop("etl.skew_job")
      SqlCompat.forgetConnection("SKEW_CONN")
    }
  }

  private def okDrop(w: QueryWrapper, sql: String): Boolean = w.query(sql)._1

  test("an in-memory wrapper (no log store) keeps DDL session-scoped: " +
      "nothing to rehydrate from") {
    val dir = Files.createTempDirectory("inmem_catalog").toString
    try {
      val w = QueryWrapper(spark, None, "inmem", clock)
      val (okS, _) = w.query(
        "CREATE SCRIPT etl.ephemeral_job () AS SELECT 1")
      assert(okS)
      // A store-backed wrapper over an EMPTY warehouse sees nothing: the
      // in-memory DDL never wrote through.
      ScriptRegistry.drop("etl.ephemeral_job")
      QueryWrapper(spark, Some(new LogStore(spark, dir, clock)), "x", clock)
      assert(ScriptRegistry.lookup("etl.ephemeral_job").isEmpty)
    } finally ScriptRegistry.drop("etl.ephemeral_job")
  }

  test("a CREATE LUA SCRIPT body is catalogued but raises the clear " +
      "not-executable error on EXECUTE") {
    try {
      val w = QueryWrapper(spark, None, "lua_outer", clock)
      w.onError = "continue"
      val (okC, _) = w.query(
        """CREATE OR REPLACE LUA SCRIPT legacy.wrapper () RETURNS TABLE AS
          |  function run() return 1 end
          |/""".stripMargin)
      assert(okC)
      val (okE, res) = w.query("EXECUTE SCRIPT legacy.wrapper()")
      assert(!okE)
      assert(res.errorMessage.contains("Lua body"), res.errorMessage)
    } finally ScriptRegistry.drop("legacy.wrapper")
  }

  test("a failing script step closes ITS job WITH ERROR and fails the " +
      "statement under the outer wrapper's error policy") {
    val dir = Files.createTempDirectory("exec_script_err").toString
    val store = new LogStore(spark, dir, clock)
    ScriptRegistry.register("failing.job") { _ =>
      Seq("boom" -> (_ => throw new RuntimeException("step failed")))
    }
    try {
      val outer = QueryWrapper(spark, Some(store), "outer5", clock)
      outer.onError = "continue"
      val (ok, _) = outer.query("EXECUTE SCRIPT failing.job()")
      assert(!ok)
      assert(store.jobLog.collect().exists(r =>
        r.getString(1) == "failing.job" &&
          r.getString(2) == "FINISHED WITH ERROR"))
    } finally ScriptRegistry.drop("failing.job")
  }
}
