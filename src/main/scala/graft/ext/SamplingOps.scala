package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling/mixing for LLM-training-data pipelines.
  *
  * Nothing here uses `rand()`: sampling decisions are pure functions of the
  * row id ([[SplitOps.bucket]] Fibonacci hashing), so a sample is
  * reproducible across runs, engines, cluster sizes, and partitionings —
  * and an appended corpus never reshuffles previously-sampled rows
  * (the q60 split-stability argument, applied to sampling).
  */
object SamplingOps {

  /** Per-stratum deterministic rate sampling: a row survives iff its id
    * bucket (0–99) is below its stratum's percentage. A pure projection
    * filter — no shuffle, scan-speed at 100 TB, pushdown-friendly.
    * `rates` maps stratum value → keep-percentage; absent strata keep
    * `defaultPct`%. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "percentages must be within [0,100]")
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(SplitOps.bucket(col(idCol)) < pct)
  }

  /** Power-law source-mixing weights: each source's sampling weight
    * relative to the LARGEST source, `(n_s / n_max)^alpha` — the classic
    * temperature-style rebalance (alpha < 1 upweights small sources).
    *
    * Normalizing against the max instead of the sum keeps the arithmetic
    * engine-exact: `n_s` and `n_max` are integers (exact in double), one
    * IEEE division and one `pow`/`sqrt` per row — no float SUM across
    * groups whose addition order could differ between engines.
    *
    * Output: (source, n_docs, rel_weight·4dp) ordered by source. The
    * per-source aggregate is map-side combined; the max arrives as a
    * broadcast 1-row aggregate cross (the q143-total pattern — no
    * unpartitioned window anywhere in the library since r10). */
  def sourceMixWeights(df: DataFrame, sourceCol: String = "source",
      alpha: Double = 0.5): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
      .localCheckpoint() // consumed by the max AND the weight projection
    val mx = counts.agg(max(col("n_docs")).as("__nmax"))
    val ratio = col("n_docs").cast("double") / col("__nmax").cast("double")
    val weight = if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(alpha))
    counts.crossJoin(broadcast(mx))
      .withColumn("rel_weight", floor(weight * 10000 + lit(0.5)) / 10000)
      .drop("__nmax")
      .orderBy(col(sourceCol))
  }

  /** Deterministic weighted sampling without replacement — the
    * Efraimidis–Spirakis A-Res scheme (Inf. Proc. Letters 2006) with the
    * uniform draw REPLACED by a hash of the row id, so the sample is a
    * pure function of (ids, weights, salt): reproducible across runs,
    * engines, partitionings, and appends of non-sampled rows, like every
    * sampler here. Each row gets key `u^(1/w)` with
    * `u = hash(id, salt) ∈ (0,1)`; the top-k keys ARE a weighted sample
    * without replacement (P(first) = w_i/Σw, exactly).
    *
    * Scale shape: the key is a projection; top-k is
    * `TakeOrderedAndProject` (per-partition heads + one merge, no global
    * sort, no shuffle of the corpus). Weights must be > 0. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: Long = 0L): DataFrame = {
    require(k >= 1)
    // Knuth-LCG uniform in (0,1): strictly inside the open interval so
    // pow() never sees 0 or 1. The id pre-reduces mod 2^31-1 BEFORE the
    // multiply — (a mod m)·k ≡ a·k (mod m), and the reduced product
    // stays < 2^63, so ANSI-mode overflow can't fire at large-id scale
    // (same fix as SplitOps.knuthMod32; results identical wherever the
    // naive product fit).
    val u = (pmod(pmod(col(idCol).cast("long") + salt, lit(2147483647L))
      * 2654435761L, lit(2147483647L)).cast("double") + 0.5d) / 2147483648.0d
    df.withColumn("__key", pow(u, lit(1.0d) / col(weightCol).cast("double")))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** Per-STRATUM deterministic weighted sampling without replacement —
    * [[weightedSample]]'s sibling for the mixture-curation case: the top-k
    * Efraimidis–Spirakis keys within every stratum (source, language,
    * shard…) rather than globally. Two deliberate differences from the
    * global variant:
    *
    *   - the uniform comes from 6 md5 nibbles of the id (not the LCG), and
    *     the comparison key is `ln(u)/w` FLOORED TO INTEGER NANO-UNITS
    *     (monotone in u^(1/w)) with an id tie-break — an engine-exact
    *     integer, so the sampled set is cross-engine reproducible and
    *     oracle-checkable, not just run-stable;
    *   - per-group top-k uses [[ShardOps.withGroupRank]]'s bounded-memory
    *     two-phase rank (one range shuffle), never a one-reducer-per-group
    *     window and never a global limit.
    *
    * Weights are clamped ≥ 1; P(row first in its stratum) = w_i/Σw_stratum
    * exactly. Output: input columns + `u6`, `key_nano`, `__grn` (1-based
    * rank within the stratum), filtered to rank ≤ k. */
  def weightedSampleStratified(df: DataFrame, idCol: String,
      strataCol: String, weightCol: String, k: Int,
      saltPrefix: String = "ws:"): DataFrame = {
    require(k >= 1)
    val u6 = conv(substring(
      md5(concat(lit(saltPrefix), col(idCol).cast("string"))), 1, 6), 16, 10)
      .cast("long")
    val w = greatest(col(weightCol).cast("double"), lit(1.0))
    val keyNano = floor(
      log((u6.cast("double") + lit(0.5)) / lit(16777216.0)) / w * lit(1e9))
      .cast("long")
    ShardOps.withGroupRank(
      df.withColumn("u6", u6).withColumn("key_nano", keyNano),
      strataCol, Seq(col("key_nano").desc, col(idCol).asc))
      .filter(col("__grn") <= k)
  }

  /** Deterministic epoch upsampling — materialize the temperature
    * rebalance [[sourceMixWeights]] describes: every doc of source `s`
    * is repeated `min(round((n_max/n_s)^alpha), cap)` times (the largest
    * source runs one epoch; smaller sources proportionally more, capped
    * so a tiny source can't explode the corpus).
    *
    * Shape at scale: the per-source copy plan is a #sources-row aggregate
    * joined back via BROADCAST; the repetition itself is a projection-time
    * `explode(sequence(1, n_copies))` — no shuffle of the corpus, output
    * flows straight to the sink. Copy counts are integer-exact (integer
    * ratio through one IEEE pow), so the materialized corpus is
    * reproducible. Output: input row + (n_copies, copy_idx). */
  def epochUpsample(df: DataFrame, sourceCol: String = "source",
      alpha: Double = 0.5, cap: Int = 8): DataFrame = {
    require(cap >= 1)
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
      .localCheckpoint() // consumed by the max AND the copy plan
    val mx = counts.agg(max(col("n_docs")).as("__nmax"))
    val inv = col("__nmax").cast("double") / col("n_docs").cast("double")
    val plan = counts.crossJoin(broadcast(mx))
      .withColumn("n_copies",
        least(floor(pow(inv, lit(alpha)) + lit(0.5)).cast("int"), lit(cap)))
      .select(col(sourceCol), col("n_copies"))
    df.join(broadcast(plan), sourceCol)
      // sequence(1, n_copies) is never empty (n_copies ≥ 1) — _outer per
      // the r6 generate rule (no inferred pre-filter duplicating it).
      .withColumn("copy_idx",
        explode_outer(sequence(lit(1), col("n_copies"))))
  }

  /** Token-BUDGET sampling: keep, per source, the deterministic
    * hash-ordered prefix of documents whose cumulative token count stays
    * within `budget` — the "take N tokens from each source" primitive of
    * training-mixture construction. Order is (Fibonacci-hash(id), id):
    * engine-exact, stable under appends (new docs insert into the order
    * without reshuffling old decisions beyond the budget boundary).
    *
    * Scale shape: the naive spelling is a running SUM window partitioned
    * by source — one reducer per source holding that source's entire
    * slice. This delegates to [[ShardOps.withGroupPrefix]] instead (the
    * shared two-phase construction also behind per-group exact ranks):
    * range-partition on (source, hash, id), partition-local running sums
    * resetting at source boundaries, per-(partition, source) totals
    * (driver-tiny summary) prefix-summed into broadcast carry-ins. No
    * reducer ever holds more than an input-split of any source.
    *
    * Output: input columns + `n_toks` + `cum_toks` (inclusive), filtered
    * to `cum_toks <= budget`. */
  def sampleToTokenBudget(docs: DataFrame, budget: Long,
      sourceCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget >= 0)
    val keyed = docs
      // The raw Fibonacci hash (SplitOps' constant, before its %100):
      // full 32-bit spread for a stable, engine-exact shuffle order.
      .withColumn("__ord", SplitOps.knuthMod32(col(idCol).cast("long")))
      .withColumn("n_toks", size(TextOps.tokens(col(textCol))))
    ShardOps.withGroupPrefix(keyed, sourceCol,
        Seq(col("__ord"), col(idCol)), valueCol = Some("n_toks"),
        outCol = "cum_toks")
      .filter(col("cum_toks") <= budget)
      .drop("__ord")
  }

  /** Deterministic EPOCH shuffle + fixed-size batch assignment — the
    * "reshuffle the corpus every epoch" primitive of a training loader,
    * without `rand()`: order is the Fibonacci hash of `id + epoch`, so
    * epoch N's permutation is a pure function of (ids, epoch) —
    * reproducible across runs, engines, and partitionings, and a resumed
    * job re-derives the exact batch schedule it crashed in.
    *
    * Scale shape: the hash is a projection; the 1-based global position
    * comes from [[ShardOps.withGlobalRank]] (ONE range shuffle,
    * bounded-memory two-phase prefix — never a single-reducer window).
    * Output: input columns + `ord_idx` (1-based epoch position),
    * `batch_id`, `pos_in_batch` (both 0-based). */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      batchSize: Long): DataFrame = {
    require(epoch >= 0 && batchSize >= 1)
    val keyed = df.withColumn("__ord",
      SplitOps.knuthMod32(col(idCol).cast("long") + epoch))
    ShardOps.withGlobalRank(keyed, Seq(col("__ord"), col(idCol)))
      .withColumn("ord_idx", col("__rn"))
      // `div`, not `/` (which is DOUBLE division in Spark SQL): batch ids
      // must stay integral.
      .withColumn("batch_id", expr(s"(__rn - 1) div $batchSize"))
      .withColumn("pos_in_batch", (col("__rn") - 1) % batchSize)
      .drop("__ord", "__rn")
  }

  /** Per-group QUANTILE floor filter: drop the bottom `pct`% of each
    * group under `sortCols` — "cut the worst-quality fifth of every
    * source" as one deterministic relational op. The threshold count is
    * integer arithmetic (`n·pct / 100` truncated), so the kept set is
    * engine-exact — no float percentile boundary to disagree over.
    *
    * Scale shape: ranks come from [[ShardOps.withGroupRank]] (one range
    * shuffle, bounded memory); group sizes are a #groups-row aggregate
    * broadcast back. No reducer holds a whole group. */
  def dropBottomPct(df: DataFrame, groupCol: String, pct: Int,
      sortCols: Seq[Column]): DataFrame = {
    require(pct >= 0 && pct <= 100)
    val counts = df.groupBy(col(groupCol).as("__gc"))
      .agg(count(lit(1)).as("__n"))
    ShardOps.withGroupRank(df, groupCol, sortCols)
      .join(broadcast(counts), col(groupCol) <=> col("__gc"))
      // `div`, not `/`: Spark's `/` is always DOUBLE division — the
      // threshold must stay integral to be engine-exact.
      .filter(col("__grn") > expr(s"__n * $pct div 100"))
      .drop("__grn", "__gc", "__n")
  }
}
