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
}
