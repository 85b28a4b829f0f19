package graft.wrapper

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** High-watermark incremental loads — the canonical etl-utils job shape
  * (register → read state → move delta → advance state → finish), composed
  * entirely from wrapper primitives so every step is job-logged and governed
  * by the wrapper's `on_error` policy.
  *
  * State lives in a two-column watermark table (`job_name`, `watermark`
  * stored as the `yyyy-MM-dd HH:mm:ss.SSSSSS` UTC text of the newest loaded
  * timestamp) — the same name/value parameter-table shape the reference
  * loads with `load_params_from_table` (query_wrapper.sql:211–224).
  *
  * Scale: only `source.tsCol > watermark` rows are read per run — with a
  * time-partitioned source this prunes to the new partitions, so a 100 TB
  * table costs one increment, not a rescan. Failure semantics: the target
  * append commits before the watermark advances, so a crash between the two
  * replays the same delta on the next run — at-least-once; pair with a
  * dedup key downstream (or an exact-dedup pass) when exactly-once matters.
  */
object Incremental {

  val WatermarkFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val Epoch = "1970-01-01 00:00:00.000000"

  /** Create the watermark table if missing. */
  def ensureStateTable(w: QueryWrapper, stateTable: String): Unit =
    w.query(
      s"""CREATE TABLE IF NOT EXISTS $stateTable
         |(job_name STRING, watermark STRING) USING parquet""".stripMargin,
      QueryOptions(logging = false))

  /** Current watermark text for `jobName`, or the epoch if none stored. */
  def currentWatermark(w: QueryWrapper, stateTable: String,
      jobName: String): String = {
    val (_, res) = w.query(
      s"SELECT watermark FROM $stateTable WHERE job_name = :JOB",
      QueryOptions(params = Some(Map("JOB" -> jobName))))
    res.rows.headOption.map(_.getString(0)).getOrElse(Epoch)
  }

  /** Load one increment: append `source` rows with `tsCol` strictly newer
    * than the stored watermark (optionally transformed) into `target`, then
    * advance the watermark via MERGE. Returns the appended row count.
    *
    * `datePartitionCol`: name of a DATE-typed hive partition column derived
    * from `tsCol` (the standard time-partitioned layout). When given, the
    * delta also filters `datePartitionCol >= date(watermark)` — THAT filter
    * is what the scan can push into partition pruning (the row-level
    * `tsCol > watermark` predicate alone cannot prune directories), so a
    * 100 TB source costs one day's partitions per run, not a rescan. */
  def loadIncrement(
      w: QueryWrapper,
      stateTable: String,
      jobName: String,
      source: DataFrame,
      tsCol: String,
      target: String,
      transform: DataFrame => DataFrame = identity,
      datePartitionCol: Option[String] = None): Long = {
    ensureStateTable(w, stateTable)
    val wm = currentWatermark(w, stateTable, jobName)

    val wmTs = to_timestamp(lit(wm), WatermarkFmt)
    // Snapshot the delta ONCE (localCheckpoint after the pruned scan): the
    // recorded watermark, the audit count, and the appended rows must all
    // come from the SAME row set. Three separate actions would each re-scan
    // the source, and rows arriving between the stats pass and the append
    // would land in the target with ts beyond the recorded watermark —
    // silently excluded from every later increment (r3 ADVICE). Lineage
    // truncation also means an executor loss fails this (replayable,
    // at-least-once) run instead of recomputing a different delta.
    val delta = datePartitionCol
      .foldLeft(source.filter(col(tsCol) > wmTs)) { (df, pc) =>
        df.filter(col(pc) >= to_date(wmTs))
      }
      .localCheckpoint(true)
    // New watermark + count BEFORE the append so a mid-write failure
    // leaves the watermark put.
    val stats = delta.agg(
      max(date_format(col(tsCol), WatermarkFmt)), count(lit(1))).head()
    if (stats.getLong(1) == 0L) {
      w.log("INFO", s"$jobName: no rows past watermark $wm")
      return 0L
    }

    // Count what is actually appended: a filtering/expanding transform
    // makes the delta count wrong for the audit log and the return value.
    val out = transform(delta)
    val loaded = out.count()
    out.write.mode("append").insertInto(target)
    w.log("INFO", s"$jobName: appended rows past watermark $wm",
      Some(loaded))

    // Unique, sanitized view name: a '-'-free UUID (job names may contain
    // arbitrary characters, and concurrent jobs in one session must never
    // clobber each other's view).
    val view = s"__graft_wm_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    w.spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(jobName, stats.getString(0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("job_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("watermark",
          org.apache.spark.sql.types.StringType))))
      .createOrReplaceTempView(view)
    try {
      w.query(
        s"""MERGE INTO $stateTable t USING $view s ON t.job_name = s.job_name
           |WHEN MATCHED THEN UPDATE SET watermark = s.watermark
           |WHEN NOT MATCHED THEN INSERT (job_name, watermark)
           |VALUES (s.job_name, s.watermark)""".stripMargin)
    } finally w.spark.catalog.dropTempView(view)
    loaded
  }
}
