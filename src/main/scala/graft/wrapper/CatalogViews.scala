package graft.wrapper

import scala.util.Try

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Catalog compatibility views — the reference README drives its main loop
  * off `exa_all_tables` / `exa_all_columns` (README.md:41, 54–57); Spark's
  * equivalents live behind the `spark.catalog` API, so this exposes them as
  * plain SQL views `all_tables` / `all_columns`.
  *
  * The views are a snapshot taken at registration (catalog metadata is
  * driver-side and tiny); call [[register]] again to refresh. */
object CatalogViews {

  private val tablesSchema = StructType(Seq(
    StructField("table_schema", StringType),
    StructField("table_name", StringType),
    StructField("table_type", StringType),
    StructField("is_temporary", BooleanType)))

  private val columnsSchema = StructType(Seq(
    StructField("table_schema", StringType),
    StructField("table_name", StringType),
    StructField("column_name", StringType),
    StructField("data_type", StringType),
    StructField("is_nullable", BooleanType)))

  def register(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val dbs = spark.catalog.listDatabases().collect().map(_.name)
    val tables = dbs.flatMap(db => spark.catalog.listTables(db).collect())
      .distinctBy(t => (Option(t.database), t.name))

    val tableRows: Seq[Row] = tables.toSeq.map { t =>
      Row(Option(t.database).orNull, t.name, t.tableType, t.isTemporary)
    }
    spark.createDataFrame(tableRows.asJava, tablesSchema)
      .createOrReplaceTempView("all_tables")

    val columnRows: Seq[Row] = tables.toSeq.flatMap { t =>
      val qualified = Option(t.database).map(db => s"$db.${t.name}").getOrElse(t.name)
      Try(spark.catalog.listColumns(qualified).collect()).getOrElse(Array.empty)
        .map(c => Row(Option(t.database).orNull, t.name, c.name, c.dataType, c.nullable))
    }
    spark.createDataFrame(columnRows.asJava, columnsSchema)
      .createOrReplaceTempView("all_columns")
  }
}
