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

    // The reference example (README.md:41, 54–57) queries the EXASOL
    // spellings verbatim: `exa_all_tables` (table_schema/table_name — same
    // as ours) and `exa_all_columns` with COLUMN_SCHEMA / COLUMN_TABLE /
    // COLUMN_NAME / COLUMN_TYPE, where COLUMN_TYPE holds Exasol type names
    // ('DATE', 'DECIMAL(18,0)', …). Register both so the README's driver
    // loop runs unchanged.
    spark.sql("SELECT * FROM all_tables")
      .createOrReplaceTempView("exa_all_tables")
    spark.sql(
      """SELECT table_schema AS column_schema, table_name AS column_table,
        |       column_name, data_type, is_nullable
        |FROM all_columns""".stripMargin)
      .withColumn("column_type",
        org.apache.spark.sql.functions.udf(exaType _)
          .apply(org.apache.spark.sql.functions.col("data_type")))
      .drop("data_type")
      .createOrReplaceTempView("exa_all_columns")
  }

  /** Spark catalog type string → the Exasol spelling the reference's
    * catalog queries compare against (Exasol integer types are DECIMAL
    * aliases: INT = DECIMAL(18,0), BIGINT = DECIMAL(36,0)). */
  private[wrapper] def exaType(sparkType: String): String =
    sparkType.toLowerCase match {
      case "string" => "VARCHAR(2000000)"
      case "bigint" | "long" => "DECIMAL(36,0)"
      case "int" | "integer" => "DECIMAL(18,0)"
      case "smallint" | "short" => "DECIMAL(9,0)"
      case "tinyint" | "byte" => "DECIMAL(3,0)"
      case "float" | "double" => "DOUBLE"
      case "boolean" => "BOOLEAN"
      case "date" => "DATE"
      case t if t.startsWith("timestamp") => "TIMESTAMP"
      case t => t.toUpperCase
    }
}
