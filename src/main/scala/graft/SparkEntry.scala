package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The declared inventory lives in [[graft.queries.Queries]]; this object is
  * a thin adapter to the driver's (name → fn, name → oracle SQL) shape. */
object SparkEntry {

  /** Flagship query (five-way star join rollup, SURVEY §2D q10) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all.find(_.name == "q10_join_multiway").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
