package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators — the streaming analogs of the batch
  * inventory (SURVEY §7.7): `readStream` → event-time transforms with
  * watermarks → `writeStream`. The reference is batch-procedural only; these
  * cover the streaming half of a modern training-data pipeline (event feeds,
  * log ingestion) Spark-natively. */
object StreamOps {

  /** Gap-based session aggregation over an event-time stream — the
    * streaming twin of q24's lag+cumsum batch sessionization, expressed
    * with the native `session_window` (state store handles the
    * merge/expiry; watermark bounds state). Output (append mode): one row
    * per closed session. */
  def sessionize(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming deduplication with bounded state: duplicates of `idCols`
    * are dropped as long as they arrive within the watermark delay of the
    * first occurrence; state for older ids is evicted. The streaming twin
    * of q25's exact dedup — the pattern for deduping a document feed
    * without unbounded state. */
  def dedupeStream(
      events: DataFrame,
      idCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Tumbling-window event counts with watermarking — the canonical
    * streaming aggregation shape. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      window: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("window.start").as("win_start"), col("n"))
}
