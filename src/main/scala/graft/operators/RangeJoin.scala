package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (equi + interval) join — pairs of rows with equal keys whose times
  * lie within `delta` of each other: `|l.time - r.time| <= delta`.
  *
  * Spark plans a raw `a.k = b.k AND abs(a.t - b.t) <= d` condition as an
  * equi-join on k with a post-filter — fine — but the common
  * key-free/low-key-cardinality case degenerates to SortMergeJoin row
  * explosion or BroadcastNestedLoop. This composition is the scale-safe
  * shape regardless of key skew: bucket both sides on `floor(time/delta)`;
  * any qualifying pair's buckets differ by at most 1, so replicating the
  * LEFT side into its 3 neighbor buckets (explode ×3 — bounded, data-size
  * independent) and hash-joining on (keys, bucket) + the exact predicate
  * yields exactly the band join with ONE shuffle and no quadratic operator.
  *
  * Contract: `left`/`right` column names must be disjoint apart from
  * `keyCols`; time columns are numeric (cast timestamps up front, e.g.
  * `unix_micros`). Right rows matching no left row (and vice versa) are
  * absent — inner semantics.
  */
object RangeJoin {

  def band(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      delta: Double): DataFrame = {
    require(delta > 0, "delta must be positive")
    val lb = left.withColumn("__lbucket",
      floor(col(leftTime).cast("double") / delta).cast("long"))
      .withColumn("__bucket",
        explode(array(col("__lbucket") - 1, col("__lbucket"),
          col("__lbucket") + 1)))
      .drop("__lbucket")
    val rb = right.withColumn("__bucket",
      floor(col(rightTime).cast("double") / delta).cast("long"))

    lb.join(rb, keyCols :+ "__bucket")
      .filter(abs(col(leftTime).cast("double") -
        col(rightTime).cast("double")) <= delta)
      .drop("__bucket")
  }
}
