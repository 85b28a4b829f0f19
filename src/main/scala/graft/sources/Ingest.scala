package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema'd text-format ingestion with a quarantine lane — the data-quality
  * shape a training-data pipeline needs at the edge: rows that fail the
  * declared schema are captured verbatim (PERMISSIVE +
  * `columnNameOfCorruptRecord`), not dropped and not fatal.
  *
  * `good` carries only schema-conforming rows; `quarantined` carries the
  * raw offending text for triage/replay. */
object Ingest {

  final case class IngestResult(good: DataFrame, quarantined: DataFrame,
      private val raw: DataFrame) {
    /** Release the cached source read once both lanes are consumed. */
    def unpersist(): Unit = { raw.unpersist(); () }
  }

  private val CorruptCol = "_corrupt_record"

  private def split(raw: DataFrame, schema: StructType): IngestResult = {
    // Spark requires materialization before referencing only the corrupt
    // column of a PERMISSIVE read (SPARK-21610) — cache once here (also
    // makes the good-count / bad-count / write trio a single source scan).
    raw.cache()
    val good = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col): _*)
    val quarantined = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_record"))
    IngestResult(good, quarantined, raw)
  }

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType))

  /** JSON-lines ingestion against a declared schema. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): IngestResult =
    split(
      spark.read
        .schema(withCorrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(path),
      schema)

  /** CSV ingestion against a declared schema. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, sep: String = ","): IngestResult =
    csvFiles(spark, Seq(path), schema, header, sep)

  /** CSV ingestion over one or more paths (`IMPORT … FILE 'a' FILE 'b'`),
    * with the reader options the IMPORT dialect exposes. `lineSep` is the
    * explicit row separator (None = default \n / \r\n handling). */
  def csvFiles(spark: SparkSession, paths: Seq[String], schema: StructType,
      header: Boolean = true, sep: String = ",", encoding: String = "UTF-8",
      nullValue: Option[String] = None,
      lineSep: Option[String] = None): IngestResult = {
    var reader = spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("sep", sep)
      .option("encoding", encoding)
    nullValue.foreach(v => reader = reader.option("nullValue", v))
    lineSep.foreach(v => reader = reader.option("lineSep", v))
    split(reader.csv(paths: _*), schema)
  }

  /** CSV ingestion that drops the first `skipLines` PHYSICAL lines before
    * parsing (`IMPORT … SKIP = n`, n > 1 — a multi-line preamble, not just
    * a header). Single-file only — enforced, because the skip must come off
    * THIS file's head: a glob or directory would silently skip lines from
    * whichever file landed in split 0. `textFile(path, 1)` keeps small
    * files in one split (the default minPartitions=2 halves them, and the
    * preamble must sit entirely in split 0); big files still split at
    * ~block size, so any sane preamble fits split 0 regardless. Quoted
    * fields spanning lines are out of scope (same as Spark's own default
    * `multiLine=false` text-splitting). */
  def csvSkippingLines(spark: SparkSession, path: String, schema: StructType,
      skipLines: Int, sep: String = ",",
      nullValue: Option[String] = None): IngestResult = {
    import spark.implicits._
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val resolved = Option(fs.globStatus(hPath)).map(_.toSeq).getOrElse(Seq.empty)
    require(resolved.length == 1 && resolved.head.isFile,
      s"SKIP > 1 requires a single regular file, got: $path")
    val n = skipLines
    val lines = spark.createDataset(
      spark.sparkContext.textFile(path, 1)
        .mapPartitionsWithIndex((i, it) => if (i == 0) it.drop(n) else it))
    var reader = spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "false")
      .option("sep", sep)
    nullValue.foreach(v => reader = reader.option("nullValue", v))
    split(reader.csv(lines), schema)
  }

  /** Row-level provenance for audit/replay: attach the source file path
    * and the row's index WITHIN that file from the scan's `_metadata`
    * struct (constant-folded by the reader — no shuffle, no
    * monotonically_increasing_id instability across re-runs: the pair
    * (file, row_index) is stable for an immutable input). Call on a
    * freshly-read file-source DataFrame, BEFORE any transformation drops
    * the metadata column. */
  def withProvenance(df: org.apache.spark.sql.DataFrame,
      pathCol: String = "src_file",
      indexCol: String = "src_row"): org.apache.spark.sql.DataFrame =
    df.select(org.apache.spark.sql.functions.col("*"),
      org.apache.spark.sql.functions.col("_metadata.file_path").as(pathCol),
      org.apache.spark.sql.functions.col("_metadata.row_index").as(indexCol))
}
