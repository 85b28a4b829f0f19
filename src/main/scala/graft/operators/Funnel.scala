package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: per user, how far through a sequence of step
  * types (e.g. view → click → purchase) the event stream got, where each
  * step must occur STRICTLY after the matched timestamp of the previous
  * one. Greedy earliest-match — equivalent to the recursive
  * `MIN(ts) WHERE ts > prev` definition, which is what the SQL spelling
  * computes, so the semantics are oracle-checkable.
  *
  * Scale shape: one shuffle on the user key; within each user the events
  * stream through `flatMapSortedGroups` in timestamp order — a sorted
  * ITERATOR with an O(#steps) accumulator, never a collect_list of the
  * user's history (the PackOps shape). Strict-`>` on the microsecond
  * timestamp means same-instant events cannot satisfy consecutive steps,
  * so result determinism needs no tie-break beyond the sort key. */
object Funnel {

  final case class FunnelEvent(user_id: Long, ts_us: Long, event_type: String)
  final case class FunnelResult(user_id: Long, steps: Int)

  /** `steps` per user: 0 if the first step type never occurs. `events`
    * needs (`user_id`, `ts` timestamp, `event_type`). */
  def steps(events: DataFrame, stepTypes: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame =
    stepsImpl(events, stepTypes, None, userCol, tsCol, typeCol)

  /** [[steps]] with a per-step MAX GAP — the standard product-analytics
    * form ("clicked within 24h of the view"): step i counts only if it
    * occurs strictly after AND within `maxGapUs` microseconds of step
    * i−1's matched event. Greedy earliest-match still equals the
    * recursive MIN-in-window oracle: t_i is always the MINIMUM eligible
    * timestamp, never revised to let the funnel run longer. Gap compared
    * in integer microseconds — engine-exact at exactly-gap pairs. */
  def stepsWithin(events: DataFrame, stepTypes: Seq[String], maxGapUs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    stepsImpl(events, stepTypes, Some(maxGapUs), userCol, tsCol, typeCol)
  }

  private def stepsImpl(events: DataFrame, stepTypes: Seq[String],
      maxGapUs: Option[Long], userCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    require(stepTypes.nonEmpty)
    val wanted = stepTypes.toArray
    events
      .filter(col(typeCol).isin(stepTypes: _*))
      .select(col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(typeCol).as("event_type"))
      .as(Encoders.product[FunnelEvent])
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapSortedGroups(col("ts_us")) { (user, it) =>
        var step = 0
        var lastTs = Long.MinValue
        it.foreach { e =>
          if (step < wanted.length && e.event_type == wanted(step) &&
              (step == 0 || (e.ts_us > lastTs &&
                maxGapUs.forall(g => e.ts_us - lastTs <= g)))) {
            lastTs = e.ts_us
            step += 1
          }
        }
        Iterator.single(FunnelResult(user, step))
      }(Encoders.product[FunnelResult])
      .toDF()
      .orderBy(col("user_id"))
  }
}
