package graft.wrapper

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** B1/B2/B3 pass-through: schema + table DDL and INSERT through the
  * wrapper, auto-logged with normalized rowcounts — the reference's own
  * bootstrap pattern (query_wrapper.sql:1–19). */
class DdlSpec extends AnyFunSuite with SparkTestBase {

  test("CREATE SCHEMA / CREATE TABLE / INSERT / DROP through query()") {
    val loc = Files.createTempDirectory("ddl").toString
    val w = QueryWrapper(spark)
    val (ok1, _) = w.query("CREATE SCHEMA IF NOT EXISTS etl_ddl")
    assert(ok1)
    val (ok2, _) = w.query(
      s"CREATE TABLE IF NOT EXISTS etl_ddl.t (a BIGINT, b STRING) USING parquet LOCATION '$loc/t'")
    assert(ok2)
    val (ok3, res3) = w.query("INSERT INTO etl_ddl.t VALUES (1, 'x'), (2, 'y')")
    assert(ok3)
    assert(res3.rowsAffected.contains(2L))
    // The wrapper's ::ident splice works on DDL-created objects too:
    w.setParam("SCH", "etl_ddl")
    w.setParam("TAB", "t")
    val (_, res4) = w.query("SELECT count(*) FROM ::SCH.::TAB")
    assert(res4.normalizedRowCount == 2)
    w.query("DROP TABLE etl_ddl.t")
    w.query("DROP SCHEMA etl_ddl")
    assert(!spark.catalog.databaseExists("etl_ddl"))
  }
}
