package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` is the wrong tool for a 100 TB corpus: its assignment is
  * a per-task RNG over a particular partitioning, so recomputation,
  * repartitioning, or an incremental append silently reshuffles examples
  * between train and test (leakage). Here the split is a pure function of
  * a stable id — a row's split NEVER changes — and the hash is plain
  * 64-bit integer arithmetic (Fibonacci/multiplicative hashing, Knuth
  * TAOCP vol. 3 §6.4), so the exact same assignment is reproducible in
  * any engine, language, or SQL dialect that has 64-bit integers.
  *
  * Everything is a per-row projection: no shuffle, no state, runs at scan
  * speed regardless of corpus size. */
object SplitOps {

  /** 2^32 · (golden-ratio conjugate) — the classic multiplicative-hash
    * constant; coprime to 2^32, spreads sequential ids uniformly. */
  private[ext] val Knuth = 2654435761L
  private[ext] val Mod = 4294967296L // 2^32

  /** `(x · Knuth) mod 2^32` computed WITHOUT 64-bit overflow: the bare
    * product exceeds Long.MaxValue once x ≥ ~3.5·10⁹, which ANSI mode
    * (Spark 4's default) turns into a task-failing ARITHMETIC_OVERFLOW —
    * ids at trillion-row corpus scale cross that line (found live on the
    * r11 sf1-derived bench, where shifted ids sit at ~9·10⁹). The low 32
    * bits split into 16-bit halves; every intermediate stays < 2⁴⁹, and
    * modular arithmetic makes the result IDENTICAL to the naive formula
    * wherever that one doesn't overflow — existing oracles and the
    * bit-identity contract are untouched. Same decomposition an oracle
    * SQL can spell when its engine needs it (DuckDB BIGINT also traps
    * overflow); fixture-scale ids never overflow there, so the committed
    * oracles keep the naive spelling. */
  private[ext] def knuthMod32(x: Column): Column = {
    val lo = pmod(x, lit(Mod))
    val hi16 = shiftright(lo, 16)
    val lo16 = lo.bitwiseAND(lit(65535L))
    pmod(pmod(hi16 * lit(Knuth), lit(Mod)) * lit(65536L) + lo16 * lit(Knuth),
      lit(Mod))
  }

  /** Uniform 0–99 bucket from a non-negative integer id. */
  def bucket(id: Column): Column =
    knuthMod32(id.cast("long")) % 100

  /** Adds a `split` column ∈ {train, val, test} with the given percentage
    * cuts (defaults 90/5/5). Buckets, not rows, are split — exact
    * fractions hold in expectation, stability holds exactly. */
  def assignSplit(df: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must cut [0,100] into train/val/test")
    val b = bucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }
}
