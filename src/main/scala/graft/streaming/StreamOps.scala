package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
final case class SessionState(start: Long, last: Long, n: Long, total: Double)
final case class SessionOut(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

final case class Scd2Obs(key: Long, ts: Timestamp, seq: Long, v: String)
final case class Scd2State(version: Int, sinceMs: Long, v: Option[String])
final case class Scd2Closed(
    key: Long,
    version: Int,
    valid_from: Timestamp,
    valid_to: Timestamp,
    v: String)

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

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * arbitrary-state API for semantics `session_window` can't express
    * (here: per-session value totals maintained incrementally, sessions
    * closed either by a later event beyond the gap or by an event-time
    * timeout once the watermark passes last+gap). State per user is one
    * [[SessionState]]; the watermark bounds it. */
  def statefulSessions(
      events: DataFrame,
      gapMs: Long = 30L * 60 * 1000,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    val typed = events
      .withWatermark("ts", watermark)
      .selectExpr("user_id", "ts", "value")
      .as(Encoders.product[SessionEvent])

    def close(key: Long, s: SessionState): SessionOut =
      SessionOut(key, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)

    def fn(key: Long, it: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(key, _)).iterator
        state.remove()
        out
      } else {
        val out = List.newBuilder[SessionOut]
        var st = state.getOption
        it.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          st match {
            case Some(s) if t - s.last <= gapMs =>
              st = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
            case Some(s) =>
              out += close(key, s)
              st = Some(SessionState(t, t, 1, e.value))
            case None =>
              st = Some(SessionState(t, t, 1, e.value))
          }
        }
        st.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        out.result().iterator
      }
    }

    typed
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        fn)(Encoders.product[SessionState], Encoders.product[SessionOut])
  }

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

  /** Stream-stream event-time interval join: pair left rows with right
    * rows of the same key whose time lies in
    * `[leftTime - before, leftTime + after]`. Watermarks on BOTH sides +
    * the two-sided time bound are exactly what lets Spark evict join state
    * — an unbounded-condition stream join would hold both streams forever.
    * The streaming twin of [[graft.operators.RangeJoin.band]]. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      before: String = "1 hour",
      after: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    val keyCond = keyCols.map(k => l(k) === r(k)).reduce(_ && _)
    val timeCond =
      r(rightTime) >= l(leftTime) - expr(s"INTERVAL $before") &&
        r(rightTime) <= l(leftTime) + expr(s"INTERVAL $after")
    keyCols.foldLeft(l.join(r, keyCond && timeCond, "inner")) {
      (df, k) => df.drop(r(k))
    }
  }

  /** Streaming SCD-2 maintenance over a CDC-style observation feed — the
    * streaming twin of [[graft.operators.Scd2.intervals]]. State per key is
    * ONE open interval (version, since, value); when an observation carries
    * a different tracked value, the open interval CLOSES and is emitted
    * `[valid_from, valid_to)`, and a new one opens. Emitted rows match the
    * batch operator's closed intervals exactly (asserted in StreamOpsSpec);
    * the open intervals live in the state store (query it for `is_current`
    * rows, or snapshot via the batch operator).
    *
    * Ordering contract: observations are sorted (ts, seq) WITHIN a batch;
    * across batches the feed must be per-key in-order (the standard CDC
    * log-compaction assumption). Dimension state never times out — one
    * tiny row per key, the bounded-by-construction case. */
  def scd2Stream(obs: Dataset[Scd2Obs]): Dataset[Scd2Closed] = {
    def fn(key: Long, it: Iterator[Scd2Obs],
        state: GroupState[Scd2State]): Iterator[Scd2Closed] = {
      val out = List.newBuilder[Scd2Closed]
      var st = state.getOption
      it.toSeq.sortBy(o => (o.ts.getTime, o.seq)).foreach { o =>
        st match {
          case Some(s) if s.v != Option(o.v) =>
            out += Scd2Closed(key, s.version, new Timestamp(s.sinceMs),
              o.ts, s.v.orNull)
            st = Some(Scd2State(s.version + 1, o.ts.getTime, Option(o.v)))
          case Some(_) => // unchanged value extends the open interval
          case None =>
            st = Some(Scd2State(1, o.ts.getTime, Option(o.v)))
        }
      }
      st.foreach(state.update)
      out.result().iterator
    }
    obs
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        fn)(Encoders.product[Scd2State], Encoders.product[Scd2Closed])
  }

  /** CDC stream → partitioned table maintenance: every micro-batch
    * upserts into a hive-partitioned parquet directory through
    * [[graft.sources.PartitionedMerge.upsert]], so each trigger reads
    * and rewrites ONLY the partitions that batch touched — the streaming
    * materialization of a daily MERGE. Within a batch, `orderCol` picks
    * the LAST change per key (a batch can carry several changes for one
    * key; PartitionedMerge requires unique keys per ANSI). foreachBatch
    * is the right tool, not a custom sink: the upsert is a batch
    * operation per trigger, and Spark guarantees batch-id-ordered,
    * effectively-once invocation with AvailableNow/checkpointing. */
  def upsertStream(cdc: DataFrame, dir: String, partCol: String,
      keyCols: Seq[String], orderCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // Tie-break equal-orderCol changes on every remaining ORDERABLE column
    // (a fixed name-sorted order) so a REPLAYED micro-batch — failure
    // recovery under AvailableNow — picks the same winner as the first
    // attempt. Two changes that tie on ALL orderable columns are
    // near-certainly byte-identical, so either pick writes the same row;
    // anything short of this would let row_number resolve the tie by
    // partition-iteration order, which replay does not preserve. Map-typed
    // columns are excluded — Spark rejects MapType in a sort order, and a
    // tie-break must not narrow the supported CDC schemas.
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(dt)
    val tieBreak = cdc.schema.fields
      .filter(f => !keyCols.contains(f.name) && f.name != orderCol &&
        orderable(f.dataType))
      .map(_.name).sorted.map(c => col(c).desc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(orderCol).desc +: tieBreak.toSeq): _*)
    cdc.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val latest = batch
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1).drop("__rk")
        .drop(orderCol)
      if (!latest.isEmpty) {
        graft.sources.PartitionedMerge.upsert(
          batch.sparkSession, dir, partCol, keyCols, latest)
        ()
      }
    }
  }

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

  /** Stream enrichment against a REFRESHABLE dimension — the
    * foreachBatch pattern for dims that change while the stream runs: a
    * plain stream-static join freezes the static plan at query start,
    * so dim updates (new files, compactions, SCD closes) are invisible;
    * re-reading the snapshot INSIDE each micro-batch picks up the
    * current state, and the broadcast keeps the join shuffle-free on
    * the stream side. `sink` receives the enriched batch (left join —
    * unmatched stream rows survive with NULL dim columns). */
  def enrichStream(stream: DataFrame, dimPath: String, joinKey: String)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val dim = batch.sparkSession.read.parquet(dimPath)
      sink(batch.join(broadcast(dim), Seq(joinKey), "left"), id)
    }

  /** Windowed approximate distinct via DataSketches HLL in streaming
    * state — the unbounded-cardinality answer to "distinct users per
    * window per segment": the aggregation state per (key, window) is a
    * BYTE-BOUNDED sketch, not a value set (exact streaming
    * `count_distinct` keeps every key in state and is disallowed in
    * append mode anyway). Partials merge map-side and across
    * micro-batches; the estimate materializes when the watermark closes
    * the window. Exact below the sketch's dense threshold. */
  def windowedDistinct(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      distinctCol: String = "user_id",
      window: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol),
        org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg($distinctCol))")
        .as("est_distinct"))
      .select(col(keyCol), col("window.start").as("win_start"),
        col("est_distinct"))
}
