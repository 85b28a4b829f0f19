package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, the payload of the nearest right row
  * with the same key: the latest with `rightTime <= leftTime` (backward,
  * inclusive) or the earliest with `rightTime >= leftTime` (forward).
  *
  * Spark has no native as-of join; the naive encodings are a non-equi range
  * join (BroadcastNestedLoop — quadratic) or a per-left-row aggregation.
  * This is the scalable composition: tag both sides, UNION, and take a
  * running `last(payload, ignoreNulls)` over a window keyed by the join key
  * and ordered by (time, right-before-left) — ONE shuffle on the key, each
  * row visited once, no range explosion. The same shape Flink/KDB users
  * expect from a native as-of.
  *
  * Contract: payload column names must not collide with left columns; right
  * rows should be unique per (key, time) — pre-aggregate otherwise. Right
  * payload values MAY be NULL: each payload is carried through the window in
  * a non-null `(present, t, v)` struct, so a matched right row with a NULL
  * payload yields NULL (not an older row's value), and "no right row yet"
  * also yields NULL.
  *
  * `tolerance(leftTime, rightTime)` optionally bounds the match (the pandas
  * `merge_asof(tolerance=…)` / kdb window-join semantics): when the matched
  * right row fails the predicate, the payloads are NULL. Evaluated on the
  * matched row only — a composed `Column` predicate, so it works for any
  * time type (e.g. `(l, r) => l.cast("long") - r.cast("long") <= lit(60)`).
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tolerance: Option[(Column, Column) => Column] = None): DataFrame =
    asOf(left, right, keyCols, leftTime, rightTime, payloadCols, tolerance,
      forwardDirection = false)

  /** Forward as-of: the EARLIEST right row with `rightTime >= leftTime`. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tolerance: Option[(Column, Column) => Column] = None): DataFrame =
    asOf(left, right, keyCols, leftTime, rightTime, payloadCols, tolerance,
      forwardDirection = true)

  /** Skew-safe backward as-of: same semantics as [[backward]], but the
    * running window is partitioned by (key, time-bucket) instead of key
    * alone, so a 90%-hot key no longer serializes one reducer. `bucket`
    * maps the time column to a coarse bucket id and MUST be monotone
    * non-decreasing in time (e.g. `_.cast("date")`, or
    * `t => unix_micros(t) div 3600000000L` for hourly).
    *
    * Cross-bucket correctness comes from a carry-in pass: per (key,
    * bucket) the final right payload is summarized (one row per bucket —
    * tiny), a prefix window over the SUMMARIES computes what a bucket
    * inherits from all earlier buckets, and the per-bucket running last is
    * coalesced with that carry-in. Work per reducer is bounded by one
    * (key, bucket) slice; the carry pass touches #keys × #buckets rows. */
  def backwardSalted(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      bucket: Column => Column,
      tolerance: Option[(Column, Column) => Column] = None): DataFrame =
    salted(left, right, keyCols, leftTime, rightTime, payloadCols, bucket,
      tolerance, forwardDirection = false)

  /** Skew-safe forward as-of — see [[backwardSalted]]. */
  def forwardSalted(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      bucket: Column => Column,
      tolerance: Option[(Column, Column) => Column] = None): DataFrame =
    salted(left, right, keyCols, leftTime, rightTime, payloadCols, bucket,
      tolerance, forwardDirection = true)

  /** Tag both sides and UNION them: left rows carry NULL payload sentinels,
    * right rows carry `(present, rightTime, value)` structs (so ignoreNulls
    * skips only "no right row", never a real NULL payload). */
  private def tagged(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    def wrapType(p: String) = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("present",
        org.apache.spark.sql.types.BooleanType, nullable = false),
      org.apache.spark.sql.types.StructField(RtField,
        right.schema(rightTime).dataType),
      org.apache.spark.sql.types.StructField("v", right.schema(p).dataType)))

    val leftSide = left.select(
      leftCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(0).as("__is_right")) ++
        payloadCols.map(p => lit(null).cast(wrapType(p)).as(p)): _*)

    val rightSide = right.select(
      leftCols.map { c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++
        Seq(col(rightTime).as("__t"), lit(1).as("__is_right")) ++
        payloadCols.map(p => struct(lit(true).as("present"),
          col(rightTime).as(RtField), col(p).as("v")).as(p)): _*)

    leftSide.unionByName(rightSide)
  }

  private val RtField = "__rt"

  private def unwrapPayload(p: String, leftTime: String,
      tolerance: Option[(Column, Column) => Column]): Column = {
    val matched = tolerance match {
      case None => col(p).isNotNull
      case Some(tol) => col(p).isNotNull &&
        coalesce(tol(col(leftTime), col(p).getField(RtField)), lit(false))
    }
    when(matched, col(p).getField("v")).as(p)
  }

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tolerance: Option[(Column, Column) => Column],
      forwardDirection: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // Backward: ascending time, right first at ties → the running last()
    // at a left row is the latest right row with rightTime <= leftTime.
    // Forward: DESCENDING time, right first at ties → the running last()
    // is the earliest right row with rightTime >= leftTime.
    val timeOrder = if (forwardDirection) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val union = tagged(left, right, keyCols, leftTime, rightTime, payloadCols)
    val filled = payloadCols.foldLeft(union) {
      (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }

    filled.filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++
        payloadCols.map(unwrapPayload(_, leftTime, tolerance)): _*)
  }

  private def salted(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      bucket: Column => Column,
      tolerance: Option[(Column, Column) => Column],
      forwardDirection: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val union = tagged(left, right, keyCols, leftTime, rightTime, payloadCols)
      .withColumn("__b", bucket(col("__t")))
    val timeOrder = if (forwardDirection) col("__t").desc else col("__t").asc
    val bucketOrder = if (forwardDirection) col("__b").desc else col("__b").asc
    val saltedKeys = keyCols :+ "__b"

    // Pass 1: running last WITHIN each (key, bucket) slice — the balanced,
    // hot-key-proof window.
    val wIn = Window.partitionBy(saltedKeys.map(col): _*)
      .orderBy(timeOrder, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(union) { (df, p) =>
      df.withColumn(s"__in_$p", last(col(p), ignoreNulls = true).over(wIn))
    }

    // Pass 2: one summary row per (key, bucket) — the bucket's FINAL right
    // payload (max_by/min_by over right rows only; left rows have a NULL
    // ordering key and are ignored). Then a prefix window across buckets
    // (per key — but only #buckets rows per key) yields each bucket's
    // carry-in from every earlier (later, for forward) bucket.
    val rightOrd = when(col("__is_right") === 1, col("__t"))
    val summaryAggs = payloadCols.map { p =>
      (if (forwardDirection) min_by(col(p), rightOrd)
       else max_by(col(p), rightOrd)).as(s"__s_$p")
    }
    val summaries = union.groupBy(saltedKeys.map(col): _*)
      .agg(summaryAggs.head, summaryAggs.tail: _*)
    val wCarry = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(bucketOrder)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = payloadCols.foldLeft(summaries) { (df, p) =>
      df.withColumn(s"__c_$p",
        last(col(s"__s_$p"), ignoreNulls = true).over(wCarry))
    }.select(saltedKeys.map(col) ++ payloadCols.map(p => col(s"__c_$p")): _*)

    // Stitch: within-bucket result, else the carry-in. Null-safe equality:
    // the unsalted window groups NULL keys into one partition, so the
    // salted variant must carry across NULL-key buckets too. `carries` is
    // keys×buckets rows — broadcast-sized.
    // Explicit plan aliases: both sides descend from `union`, so dataset-
    // column references would resolve to the same attribute ids and rely on
    // Spark's trivially-true-predicate repair.
    val f = filled.as("__f")
    val c = carries.as("__c")
    val joinCond = saltedKeys.map(k => col("__f." + k) <=> col("__c." + k))
      .reduce(_ && _)
    val stitched = f.join(c, joinCond, "left")
      .select(col("__f.*") +: payloadCols.map(p => col("__c.__c_" + p)): _*)
    val finalized = payloadCols.foldLeft(stitched) { (df, p) =>
      df.withColumn(p, coalesce(col(s"__in_$p"), col(s"__c_$p")))
    }
    finalized.filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++
        payloadCols.map(unwrapPayload(_, leftTime, tolerance)): _*)
  }
}
