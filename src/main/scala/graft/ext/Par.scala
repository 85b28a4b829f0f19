package graft.ext

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan fan-out for CPU-dense per-row stages (regex chains,
  * hashing, deletion-variant explodes): a single-row-group parquet file
  * scans as ONE task no matter the core count, so a compute-bound
  * projection serializes on one core. When the plan yields fewer
  * partitions than the session's parallelism, one round-robin repartition
  * of the (small) input unlocks every core; at production scale a scan
  * already carries ≥ cores splits and this is a NO-OP — no extra exchange
  * ever reaches a large input (guide §2: derive partitioning from input
  * size, don't hard-code either deployment). Use only where downstream
  * math is partitioning-independent (integer/count aggregates, per-row
  * projections, sorted collect_lists). */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
