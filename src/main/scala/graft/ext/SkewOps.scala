package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-key skew diagnostics — the report you run BEFORE committing a
  * 100 TB shuffle on a key: row/key cardinalities, the exact heaviest
  * key, nearest-rank p50/p99 of key multiplicity, and the skew ratio
  * `max_cnt · n_keys / n` (1 = perfectly uniform; the factor by which
  * the hottest reducer exceeds the average). Feeds the decision between
  * a plain shuffle join, [[graft.operators.SkewJoin]] salting, or a
  * broadcast.
  *
  * Exactness contract: multiplicity quantiles are NEAREST-RANK LOWER
  * (`rank = (p·(n_keys − 1)) div 100 + 1` under (cnt, key) ordering) —
  * integer semantics both engines replicate bit-exactly, per the q106
  * lower-median discipline; the heaviest key is the rank-`n_keys` row of
  * the SAME order (ties broken by key, deterministic by construction).
  * The skew ratio is one shared IEEE expression floored to micro-units.
  *
  * Shape at 100 TB: ONE shuffle builds per-key counts (map-side partial
  * combine, so the shuffle carries keys, not rows); the count frame
  * (#distinct keys) then flows through the bounded-memory two-phase
  * global rank ([[ShardOps.withGlobalRank]] — never a single-reducer
  * window). The three rank probes run as ONE pass: the 3-row (tag, rank)
  * spec derived from the totals broadcasts into a single equi-join on
  * `__rn`, and a global conditional aggregate pivots the ≤3 hits to one
  * row. Nothing after the first aggregate scales with the table — and
  * nothing multiplies partitions: chaining per-probe cross joins instead
  * costs numPartitions^k near-empty tasks (the original spelling spent
  * ~35 s scheduling 32³ tasks on a 1500-key frame; this one is
  * milliseconds). */
object SkewOps {

  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = ShardOps.withGlobalRank(counts, Seq(col("cnt"), col("k")))
      .localCheckpoint() // consumed by the totals + the probe pass
    val totals = ranked.agg(
      sum(col("cnt")).as("n"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"))
    // nearest-rank-lower probe spec: 3 (tag, rank) rows from the 1-row
    // totals, broadcast into one equi-join against the ranked frame
    val specs = totals.select(explode(array(
        struct(lit("top").as("tag"), col("n_keys").as("r")),
        struct(lit("p50").as("tag"),
          expr("(n_keys - 1) * 50 div 100 + 1").as("r")),
        struct(lit("p99").as("tag"),
          expr("(n_keys - 1) * 99 div 100 + 1").as("r")))).as("s"))
      .select(col("s.tag").as("tag"), col("s.r").as("r"))
    val hits = ranked
      .join(broadcast(specs), col("__rn") === col("r"))
      .agg(
        max(when(col("tag") === "top", col("k"))).as("top_key"),
        max(when(col("tag") === "p50", col("cnt"))).as("p50_cnt"),
        max(when(col("tag") === "p99", col("cnt"))).as("p99_cnt"))
    totals.crossJoin(broadcast(hits))
      .withColumn("skew_micro",
        floor(col("max_cnt").cast("double") * col("n_keys") / col("n")
          * lit(1000000.0)).cast("long"))
      .select(col("n"), col("n_keys"), col("max_cnt"), col("top_key"),
        col("p50_cnt"), col("p99_cnt"), col("skew_micro"))
  }
}
