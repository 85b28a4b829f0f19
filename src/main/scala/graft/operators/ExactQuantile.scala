package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact interpolated per-group quantiles (ANSI `PERCENTILE_CONT` / DuckDB
  * `QUANTILE_CONT`) without an unbounded aggregation buffer.
  *
  * Spark's built-in exact `percentile` aggregate materializes EVERY value of
  * a group inside one buffer on one reducer — with a handful of groups over
  * a 100 TB column that is an executor OOM by construction. This operator
  * computes the same numbers with bounded memory everywhere:
  *
  *  1. Range-shuffle `(group…, value)` so rows are globally ordered across
  *     partitions; a hot group spans MANY partitions instead of one buffer.
  *  2. Count rows per `(range-partition, group)` cell — a tiny aggregate
  *     (#partitions × #groups rows) — and prefix-sum it per group to get
  *     each cell's global rank offset.
  *  3. `row_number` WITHIN each cell (window partitions are bounded by one
  *     shuffle partition's rows) + broadcast-joined offset = exact global
  *     rank, with no single reducer ever seeing a whole group.
  *  4. Keep only the ≤2 rows per (group, p) at ranks `⌊h⌋+1`/`⌊h⌋+2` where
  *     `h = (n−1)·p`, and linearly interpolate: `v_lo + (h−⌊h⌋)·(v_hi−v_lo)`
  *     — the `QUANTILE_CONT` definition.
  *
  * Ties are safe: the range partitioner assigns EQUAL sort keys to the same
  * partition, so local ranks compose into a total global rank. NULL values
  * are ignored (SQL aggregate semantics); groups with no non-null values are
  * absent from the output. NULL group keys form their own group (null-safe
  * stitch join). Reference evidence: query_wrapper.sql:40 pass-through —
  * Exasol evaluates PERCENTILE_CONT host-side.
  */
object ExactQuantile {

  /** One output row per group with `outNames` double columns, one per `ps`
    * entry. `ps` must be in [0, 1]. */
  def quantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[Double],
      outNames: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == outNames.length,
      "one output name per quantile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), "quantiles must be in [0,1]")
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val gcols = groupCols.map(col)

    val ranged = df
      .select(gcols :+ col(valueCol).cast("double").as("__v"): _*)
      .where(col("__v").isNotNull)
      .repartitionByRange(parts, gcols :+ col("__v"): _*)
      .withColumn("__pid", spark_partition_id())

    // #partitions × #groups rows — driver-tiny; its windows below are too.
    val cells = ranged.groupBy(col("__pid") +: gcols: _*)
      .agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cells
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(gcols: _*)))
      .drop("__c")

    // Local rank inside one (range-partition, group) cell, via a
    // mapPartitions counter that resets on group-key change over the
    // partition-sorted rows — NOT a Window.partitionBy(__pid, group):
    // Catalyst cannot see that range-partitioned rows are already
    // clustered by partition id and would insert a SECOND full-data hash
    // exchange under the window (same fix as ShardOps.withGlobalRank, r7;
    // one range shuffle total, asserted in ExactQuantileSpec).
    val nGroupCols = groupCols.length
    val sorted = ranged.sortWithinPartitions(gcols :+ col("__v"): _*)
    val rankedSchema = sorted.schema.add("__lrn", LongType, nullable = false)
    val localRanked = sorted.mapPartitions { it =>
      var prevKey: Seq[Any] = null
      var i = 0L
      it.map { r =>
        // SQL grouping treats NaN as equal to itself; Scala == does not.
        val key = (0 until nGroupCols).map { j =>
          r.get(j) match {
            case d: java.lang.Double if d.isNaN => "__nan"
            case f: java.lang.Float if f.isNaN => "__nan"
            case v => v
          }
        }
        if (key != prevKey) { prevKey = key; i = 0L }
        i += 1
        Row.fromSeq(r.toSeq :+ i)
      }
    }(Encoders.row(rankedSchema))

    // Null-safe equi-join (NULL group keys are a real group) on a broadcast.
    // Both sides descend from `ranged`, so explicit plan aliases keep the
    // resolver honest — dataset-column references here resolve to the SAME
    // attribute ids and Spark only repairs the "trivially true" condition
    // heuristically via dataset-id metadata.
    val joinKeys = "__pid" +: groupCols
    val l = localRanked.as("__l")
    val o = offsets.as("__o")
    val cond = joinKeys.map(k => col("__l." + k) <=> col("__o." + k))
      .reduce(_ && _)
    val ranked = l.join(broadcast(o), cond)
      .select(col("__l.*"), col("__o.__off"), col("__o.__n"))
      .withColumn("__rn", col("__off") + col("__lrn"))

    // ≤ 2·|ps| surviving rows per group → final agg shuffle is trivial.
    val needed = ps.map { p =>
      val lo = floor((col("__n") - 1) * lit(p)) + 1
      col("__rn") === lo || col("__rn") === lo + 1
    }.reduce(_ || _)

    val aggs = ps.zip(outNames).map { case (p, name) =>
      val loRow = floor((col("__n") - 1) * lit(p)) + 1
      val vLo = max(when(col("__rn") === loRow, col("__v")))
      val vHi = max(when(col("__rn") === loRow + 1, col("__v")))
      val hAgg = (max(col("__n")) - 1) * lit(p)
      val frac = hAgg - floor(hAgg)
      (vLo + frac * (coalesce(vHi, vLo) - vLo)).as(name)
    }
    ranked.where(needed).groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
