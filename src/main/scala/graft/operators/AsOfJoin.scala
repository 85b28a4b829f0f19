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
    val rtField = "__rt"
    def wrapType(p: String) = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("present",
        org.apache.spark.sql.types.BooleanType, nullable = false),
      org.apache.spark.sql.types.StructField(rtField,
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
        // Wrap so that ignoreNulls skips only "no right row" sentinels,
        // never a real right row whose payload happens to be NULL.
        payloadCols.map(p => struct(lit(true).as("present"),
          col(rightTime).as(rtField), col(p).as("v")).as(p)): _*)

    // Backward: ascending time, right first at ties → the running last()
    // at a left row is the latest right row with rightTime <= leftTime.
    // Forward: DESCENDING time, right first at ties → the running last()
    // is the earliest right row with rightTime >= leftTime.
    val timeOrder = if (forwardDirection) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = payloadCols.foldLeft(leftSide.unionByName(rightSide)) {
      (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }

    def unwrap(p: String): Column = {
      val matched = tolerance match {
        case None => col(p).isNotNull
        case Some(tol) => col(p).isNotNull &&
          coalesce(tol(col(leftTime), col(p).getField(rtField)), lit(false))
      }
      when(matched, col(p).getField("v")).as(p)
    }

    filled.filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++ payloadCols.map(unwrap): _*)
  }
}
