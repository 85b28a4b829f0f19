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
  * window) and three rank probes stitched by 1-row cross joins.
  * Nothing after the first aggregate scales with the table. */
object SkewOps {

  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = ShardOps.withGlobalRank(counts, Seq(col("cnt"), col("k")))
      .localCheckpoint() // consumed by the totals + three rank probes
    val totals = ranked.agg(
      sum(col("cnt")).as("n"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"))
    def probe(rankExpr: String, as: String) =
      ranked.crossJoin(totals.select(col("n_keys").as("__nk")))
        .filter(col("__rn") === expr(rankExpr))
        .select(col("k").as(s"${as}_key"), col("cnt").as(s"${as}_cnt"))
    val top = probe("__nk", "top").drop("top_cnt")
    val p50 = probe("(__nk - 1) * 50 div 100 + 1", "p50").drop("p50_key")
    val p99 = probe("(__nk - 1) * 99 div 100 + 1", "p99").drop("p99_key")
    totals.crossJoin(top).crossJoin(p50).crossJoin(p99)
      .withColumn("skew_micro",
        floor(col("max_cnt").cast("double") * col("n_keys") / col("n")
          * lit(1000000.0)).cast("long"))
      .select(col("n"), col("n_keys"), col("max_cnt"), col("top_key"),
        col("p50_cnt"), col("p99_cnt"), col("skew_micro"))
  }
}
