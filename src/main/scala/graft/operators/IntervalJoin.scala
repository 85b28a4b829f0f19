package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval OVERLAP self-join: all pairs of rows (same key) whose
  * `[start, end]` intervals intersect — the temporal-join sibling of
  * [[RangeJoin]] (band join on points) and AsOfJoin (nearest preceding
  * point). The reference (exasol/etl-utils `query_wrapper.sql:40`)
  * delegates such SQL to the host engine, which plans the quadratic
  * per-key nested loop; at 100 TB the bucketized shape below is the one
  * that survives.
  *
  * Algorithm (the standard time-bucket equi-join reduction):
  *   1. each interval explodes into the fixed-width buckets it covers —
  *     `(end div W) − (start div W) + 1` rows; pick `bucketMicros` ≥ the
  *     typical interval length so the expansion stays a small constant;
  *   2. ONE equi-shuffle on (key, bucket) collocates every pair that
  *     could overlap (two overlapping intervals share the bucket of
  *     `max(start₁, start₂)`: the later-starting interval starts there,
  *     and the earlier one covers it because they overlap);
  *   3. a pair is EMITTED only from that one bucket
  *     (`bucket = max(start₁, start₂) div W`), so no pair appears twice
  *     and no `distinct` pass is needed — the dedup is a codegen'd
  *     filter, not a shuffle.
  *
  * Intervals are CLOSED and in integer units (microseconds by
  * convention — the repo's time-boundary rule: compare timestamps in
  * integer micros, never seconds-as-double). Rows with `end < start`
  * are dropped (an empty interval overlaps nothing). NULL keys never
  * join (SQL equi-join semantics).
  *
  * Output: (`keyCol`, a_id, b_id, overlap_us), `a_id < b_id`, ordered —
  * `overlap_us = min(end) − max(start)` (≥ 0, closed-interval overlap
  * length in the input unit).
  */
object IntervalJoin {

  def overlapSelfJoin(df: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val base = df.select(col(keyCol).as("k"), col(idCol).as("id"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      .filter(col("e") >= col("s"))
    val bucketed = base.select(col("k"), col("id"), col("s"), col("e"),
      explode(expr(s"sequence(s div $bucketMicros, e div $bucketMicros)"))
        .as("b"))
    val a = bucketed.select(col("k"), col("b"), col("id").as("a_id"),
      col("s").as("a_s"), col("e").as("a_e"))
    val bb = bucketed.select(col("k"), col("b"), col("id").as("b_id"),
      col("s").as("b_s"), col("e").as("b_e"))
    a.join(bb, Seq("k", "b"))
      .filter(col("a_id") < col("b_id") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("b") === expr(s"greatest(a_s, b_s) div $bucketMicros"))
      .select(col("k").as(keyCol), col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .as("overlap_us"))
      .orderBy(col(keyCol), col("a_id"), col("b_id"))
  }
}
