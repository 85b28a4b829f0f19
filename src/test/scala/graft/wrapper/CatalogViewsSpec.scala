package graft.wrapper

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The README's catalog-introspection pattern (RM:41, 54–57) through the
  * wrapper: iterate all_tables, introspect all_columns. */
class CatalogViewsSpec extends AnyFunSuite with SparkTestBase {

  test("all_tables / all_columns views back the README main loop") {
    val loc = Files.createTempDirectory("cat_v").toString
    spark.sql(s"CREATE TABLE cat_spec_t (a BIGINT, b STRING) USING parquet LOCATION '$loc/t'")
    try {
      CatalogViews.register(spark)
      val w = QueryWrapper(spark)
      // RM:41: destructured iteration over the table catalog
      val found = w.queryValues(
        "SELECT table_schema, table_name FROM all_tables WHERE table_name = 'cat_spec_t'")
        .toList
      assert(found == List(Seq("default", "cat_spec_t")))
      // RM:54-57: column introspection with value params
      w.setParam("TN", "cat_spec_t")
      val (_, res) = w.query(
        "SELECT column_name, data_type FROM all_columns WHERE table_name = :TN ORDER BY column_name")
      assert(res.rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("a", "bigint"), ("b", "string")))
    } finally spark.sql("DROP TABLE IF EXISTS cat_spec_t")
  }

  test("reference README example runs against the exa_* spellings verbatim") {
    val loc = Files.createTempDirectory("cat_exa").toString
    // one table WITH a DATE column, one without (README.md:52-65 branches
    // on exa_all_columns.column_type = 'DATE')
    spark.sql(s"CREATE TABLE exa_spec_d (id BIGINT, d DATE) USING parquet LOCATION '$loc/d'")
    spark.sql(s"CREATE TABLE exa_spec_n (id BIGINT, s STRING) USING parquet LOCATION '$loc/n'")
    spark.sql("INSERT INTO exa_spec_d VALUES (1, DATE'2026-01-01'), (2, DATE'2026-02-01')")
    spark.sql("INSERT INTO exa_spec_n VALUES (3, 'x')")
    try {
      CatalogViews.register(spark)
      val dir = Files.createTempDirectory("exa_logs").toString
      val store = new LogStore(spark, dir)
      val w = QueryWrapper(spark, Some(store), "test_script")
      // the README driver loop, transliterated Lua -> Scala 1:1
      for (Seq(tableSchema, tableName) <- w.queryValues(
          """SELECT table_schema, table_name FROM exa_all_tables
            |WHERE table_name LIKE 'exa_spec_%'""".stripMargin).toList) {
        w.setParam("SCH", Params.quote(String.valueOf(tableSchema)))
        w.setParam("TAB", Params.quote(String.valueOf(tableName)))
        val (okC, _) = w.query("SELECT COUNT(*) FROM ::SCH.::TAB")
        assert(okC)
        w.setParam("SCH_unquoted", tableSchema)
        w.setParam("TAB_unquoted", tableName)
        val (suc, res) = w.query(
          """SELECT COUNT(*)
            |FROM   exa_all_columns
            |WHERE  column_schema = :SCH_unquoted
            |   AND column_table  = :TAB_unquoted
            |   AND column_type   = 'DATE';""".stripMargin)
        assert(suc, res.error)
        val nDate = res.rows.head.getLong(0)
        if (nDate > 0)
          w.log("MY_LOG", s"$tableSchema.$tableName contains $nDate date columns")
      }
      w.finish()
      val details = store.jobDetails.collect()
      val myLogs = details.filter(r => r.getString(3) == "MY_LOG")
      assert(myLogs.map(_.getString(4)).toSeq ==
        Seq("default.exa_spec_d contains 1 date columns"))
      assert(store.jobLog.collect()
        .head.getString(2) == "FINISHED SUCCESSFULLY")
    } finally {
      spark.sql("DROP TABLE IF EXISTS exa_spec_d")
      spark.sql("DROP TABLE IF EXISTS exa_spec_n")
    }
  }
}
