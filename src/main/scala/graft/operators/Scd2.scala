package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension type-2 history builder: collapse a change log
  * into validity intervals.
  *
  * Input: one row per observation `(key, ts, tracked attributes…)`.
  * Output: one row per CHANGE — consecutive observations of the same key
  * with identical tracked values merge into a single interval
  * `[valid_from, valid_to)`, with `version` (1-based change ordinal per
  * key) and `is_current` (open interval: `valid_to` IS NULL).
  *
  * This is the gaps-and-islands construction, entirely per-key windows:
  *
  *  1. `lag(tracked)` per key ordered by (ts, tieBreaker) → change flag
  *     (null-safe: a NULL→value or value→NULL transition is a change);
  *  2. running sum of change flags → island id;
  *  3. per (key, island): `valid_from = min(ts)`; then `lead(valid_from)`
  *     over islands → `valid_to`.
  *
  * Every window partitions by the dimension key, so work distributes by
  * key cardinality — the natural shape for a 100 TB change log (billions
  * of keys, bounded history per key). No unpartitioned window anywhere.
  *
  * Reference evidence: exasol/etl-utils is an ETL wrapper; SCD maintenance
  * is the canonical ETL pattern its MERGE/UPDATE surface exists to serve
  * (query_wrapper.sql:40 pass-through; SqlCompat implements MERGE natively).
  */
object Scd2 {

  /** @param keyCols     dimension key columns
    * @param tsCol       observation timestamp
    * @param trackedCols attribute columns whose changes open a new interval
    * @param tieBreaker  unique column ordering same-ts observations */
  def intervals(df: DataFrame, keyCols: Seq[String], tsCol: String,
      trackedCols: Seq[String], tieBreaker: String): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val byKey = Window.partitionBy(keys: _*)
      .orderBy(col(tsCol), col(tieBreaker))
    // First observation of a key always opens an interval — detected via
    // lag over the (non-null, unique) tie-breaker, NOT the tracked columns:
    // a key whose first tracked value is NULL would otherwise compare
    // null<=>null = unchanged and land in island 0.
    val firstOfKey = lag(col(tieBreaker), 1).over(byKey).isNull
    val changed = trackedCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(byKey)))
      .reduce(_ || _)
    val islands = df
      .withColumn("__chg", when(firstOfKey || changed, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__chg"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // First row of each island carries the interval; tracked values are
    // constant within an island by construction.
    val perIsland = islands
      .groupBy((keys :+ col("__island")).map(c => c): _*)
      .agg(
        min(col(tsCol)).as("valid_from"),
        trackedCols.map(c => first(col(c)).as(c)): _*)
    val byIsland = Window.partitionBy(keys: _*).orderBy(col("__island"))
    perIsland
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byIsland))
      .withColumn("version", col("__island").cast("int"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__island")
  }
}
