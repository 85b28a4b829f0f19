package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Config-driven stream-source swap for the [[StreamOps]] operators.
  *
  * Every operator in [[StreamOps]] takes a plain streaming `DataFrame`, so
  * the source is a deployment concern, not an operator concern: the same
  * sessionize/dedupe/join pipeline runs off a file drop in tests and a
  * Kafka topic in production by swapping ONE config value:
  *
  * {{{
  * val src: StreamSource =
  *   if (conf("source") == "kafka")
  *     KafkaSource(conf("brokers"), conf("topic"), schema)
  *   else FileSource(conf("path"), schema)
  * StreamOps.sessionize(src.read(spark))
  * }}}
  *
  * Both sources yield the SAME declared row schema, and both keep the
  * bounded-state guarantees — watermarks are applied downstream by the
  * operators, independent of the source.
  *
  * The Kafka path needs the standard `spark-sql-kafka` connector on the
  * classpath at runtime (it is a separate artifact in every Spark
  * distribution); [[KafkaSource.decode]] — the actual record-to-row logic
  * — is pure DataFrame code, exercised in tests against the connector's
  * documented wire schema without a broker.
  */
sealed trait StreamSource {
  def read(spark: SparkSession): DataFrame
}

/** File-drop source (the test/backfill path): new files in `path` become
  * micro-batches. `format`: parquet | json | csv. */
final case class FileSource(path: String, schema: StructType,
    format: String = "parquet") extends StreamSource {
  override def read(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)
}

/** Kafka topic source: each record's `value` is a JSON document matching
  * `schema`. `startingOffsets`/`maxOffsetsPerTrigger` are the two knobs
  * that matter operationally (replay position; per-batch backpressure
  * cap — without it a backlogged topic arrives as one giant batch). */
final case class KafkaSource(
    bootstrapServers: String,
    topic: String,
    schema: StructType,
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Option[Long] = None) extends StreamSource {

  /** The connector option map (exposed for tests/inspection). */
  def options: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets) ++
    maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  override def read(spark: SparkSession): DataFrame =
    KafkaSource.decode(
      spark.readStream.format("kafka").options(options).load(), schema)
}

object KafkaSource {
  /** Decode the connector's wire schema (binary key/value + topic,
    * partition, offset, timestamp, timestampType) into the declared row
    * schema. Malformed JSON yields a row of NULLs rather than failing the
    * stream (from_json PERMISSIVE default) — feed it through
    * [[StreamOps.dedupeStream]]/filters like any other row. Columns
    * present in `schema` but absent from the payload come back NULL;
    * `kafka_ts` (broker append time) is kept for pipelines that watermark
    * on arrival time instead of a payload field. */
  def decode(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(
      from_json(col("value").cast("string"), schema).as("__r"),
      col("timestamp").as("kafka_ts"))
      .select(col("__r.*"), col("kafka_ts"))
}
