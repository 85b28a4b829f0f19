package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the payload of the latest right
  * row with the same key and `rightTime <= leftTime` (inclusive).
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
  * a non-null `(present, v)` struct, so a matched right row with a NULL
  * payload yields NULL (not an older row's value), and "no right row yet"
  * also yields NULL.
  */
object AsOfJoin {

  def backward(
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
        payloadCols.map(p =>
          struct(lit(true).as("present"), col(p).as("v")).as(p)): _*)

    // At equal times the right row sorts first (__is_right desc), so a left
    // row sees a same-timestamp right row — inclusive <= semantics.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = payloadCols.foldLeft(leftSide.unionByName(rightSide)) {
      (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }

    filled.filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col(p).getField("v").as(p)): _*)
  }
}
