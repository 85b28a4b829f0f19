package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic shard assignment for training-data export.
  *
  * A tokenizer-bound training job wants N output shards of near-equal
  * SIZE (bytes/tokens), not near-equal row count — and the assignment must
  * be reproducible across runs and engines. The classic driver-side greedy
  * bin-packing is inherently sequential; the distributed equivalent used
  * here is size-ranked round-robin: order rows by (size DESC, unique id),
  * assign shard = (rank − 1) mod N. Consecutive ranks land on different
  * shards, so the largest N items spread across all shards, the next N
  * likewise — per-shard totals differ by at most one item's size per
  * round, within a factor trivially close to optimal for heavy-tailed
  * size distributions.
  *
  * The global rank itself is the scale-sensitive part: `row_number()` over
  * an unpartitioned window is a single-reducer sort. This implementation
  * reuses the bounded-memory global-rank construction proven in
  * [[graft.operators.ExactQuantile]]:
  *
  *  1. `repartitionByRange` on the sort key — rows globally ordered ACROSS
  *     partitions, each partition input-split-bounded;
  *  2. per-partition counts (#partitions rows, driver-tiny) prefix-summed
  *     into per-partition rank offsets;
  *  3. local `row_number` within each range partition + broadcast offset
  *     = exact global rank, no single reducer ever holding the full table.
  *
  * Reference evidence: exasol/etl-utils delegates all SQL to the host
  * engine (query_wrapper.sql:40); ranked export is host-side there. The
  * shard balancing itself is training-pipeline surface beyond the
  * reference, per the build brief.
  */
object ShardOps {

  /** Adds `__rn` (1-based exact global rank by `sortCols`) with bounded
    * memory everywhere. Ties within equal sort keys land in the same range
    * partition, so local ranks compose into a total order; pass a unique
    * tie-breaker column for full determinism.
    *
    * The local rank is a per-partition counter via `mapPartitions`, NOT a
    * `Window.partitionBy(spark_partition_id())`: Catalyst cannot see that
    * range-partitioned rows are already clustered by partition id and
    * would insert a SECOND full-data hash exchange under the window
    * (measured in the q72 plan). One range shuffle total (asserted in
    * ShardOpsSpec). */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column]): DataFrame =
    withGroupPrefix(df.withColumn("__gall", lit(true)), "__gall", sortCols,
      valueCol = None, outCol = "__rn").drop("__gall")

  /** 1-based rank WITHIN `groupCol` by `sortCols`, bounded memory — the
    * per-group sibling of [[withGlobalRank]] and the machinery behind
    * stratified top-k curation ("best N docs per source"). The naive
    * `Window.partitionBy(group)` routes EVERY row of a group through one
    * reducer; here the data range-partitions on (group, sortCols) — each
    * partition's rows are group-contiguous, so a partition-local counter
    * that RESETS at group boundaries yields local ranks, and
    * per-(partition, group) counts (a driver-tiny summary) prefix-sum per
    * group into broadcast carry-ins. No reducer ever holds more than an
    * input-split of any group. Include a unique tie-breaker in `sortCols`
    * for full determinism; NULL group values rank together. Adds `__grn`. */
  def withGroupRank(df: DataFrame, groupCol: String,
      sortCols: Seq[Column]): DataFrame =
    withGroupPrefix(df, groupCol, sortCols, valueCol = None, outCol = "__grn")

  /** The shared two-phase per-group PREFIX construction behind
    * [[withGroupRank]] (value = 1 per row → exact rank) and
    * [[SamplingOps.sampleToTokenBudget]] (value = a weight column →
    * running sum): range-partition on (group, sortCols), a
    * partition-local accumulator that resets at group boundaries,
    * per-(partition, group) totals prefix-summed per group into broadcast
    * carry-ins. ONE full-data shuffle; no reducer holds more than an
    * input-split of any group. `valueCol` must be integral when given. */
  private[ext] def withGroupPrefix(df: DataFrame, groupCol: String,
      sortCols: Seq[Column], valueCol: Option[String],
      outCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // The group key is (isNull, stringified value): no sentinel string can
    // collide with a real group value, and join/group keys stay non-NULL.
    val keyed = df
      .withColumn("__gnull", col(groupCol).isNull)
      .withColumn("__grp", coalesce(col(groupCol).cast("string"), lit("")))
    val keys = Seq(col("__gnull"), col("__grp")) ++ sortCols
    val sorted = keyed
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
    val nullIdx = sorted.schema.fieldIndex("__gnull")
    val grpIdx = sorted.schema.fieldIndex("__grp")
    val vIdx = valueCol.map(sorted.schema.fieldIndex)
    val outSchema = sorted.schema.add("__lcum", LongType, nullable = false)
    val local = sorted.mapPartitions { it =>
      var g: (Boolean, String) = null
      var cum = 0L
      it.map { r =>
        val k = (r.getBoolean(nullIdx), r.getString(grpIdx))
        if (g == null || k != g) { g = k; cum = 0L }
        cum += vIdx.map(i => r.getAs[Number](i).longValue).getOrElse(1L)
        Row.fromSeq(r.toSeq :+ cum)
      }
    }(Encoders.row(outSchema))
    val wOff = Window.partitionBy(col("__gnull"), col("__grp"))
      .orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"), col("__gnull"), col("__grp"))
      .agg(valueCol.map(c => sum(col(c))).getOrElse(count(lit(1))).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .drop("__c")
    local.join(broadcast(offsets), Seq("__pid", "__gnull", "__grp"))
      .withColumn(outCol, col("__off") + col("__lcum"))
      .drop("__gnull", "__grp", "__pid", "__lcum", "__off")
  }

  /** 1-based running SUM of `valueCol` (integral) over the global
    * `sortCols` order — [[withGlobalRank]]'s value sibling, the
    * Pareto/ABC cumulative-share primitive. Same bounded-memory
    * two-phase construction, ONE range shuffle. Include a unique
    * tie-breaker in `sortCols` for full determinism. Adds `__rsum`. */
  def withGlobalPrefixSum(df: DataFrame, sortCols: Seq[Column],
      valueCol: String): DataFrame =
    withGroupPrefix(df.withColumn("__gall", lit(true)), "__gall", sortCols,
      valueCol = Some(valueCol), outCol = "__rsum").drop("__gall")

  /** 1-based inclusive running SUM of `valueCol` (integral) over
    * `sortCols` WITHIN `groupCol` — the per-group sibling of
    * [[withGlobalPrefixSum]] ([[withGroupRank]] : [[withGlobalRank]] ::
    * this : that). Replaces the `SUM OVER (PARTITION BY g ORDER BY v)`
    * window wherever a group could hold an unbounded value domain:
    * same two-phase bounded-memory construction, ONE range shuffle, no
    * reducer ever holds more than an input-split of any group. Include
    * a unique tie-breaker in `sortCols` for full determinism. Adds
    * `__grsum`. */
  def withGroupPrefixSum(df: DataFrame, groupCol: String,
      sortCols: Seq[Column], valueCol: String): DataFrame =
    withGroupPrefix(df, groupCol, sortCols, valueCol = Some(valueCol),
      outCol = "__grsum")

  /** Assigns every row a shard in [0, nShards) balanced by `sizeCol`,
    * deterministically: size-ranked round-robin over
    * (sizeCol DESC, tieBreaker ASC). Output = input columns + `shard`. */
  def assignShards(df: DataFrame, nShards: Int, sizeCol: String,
      tieBreaker: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    withGlobalRank(df, Seq(col(sizeCol).desc, col(tieBreaker).asc))
      .withColumn("shard", ((col("__rn") - 1) % nShards).cast("int"))
      .drop("__rn")
  }
}
