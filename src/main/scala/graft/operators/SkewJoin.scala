package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deliberate salting for skewed keys. AQE's skew-join handles sort-merge
  * skew at runtime; explicit salting is still the tool when (a) the skew
  * is in an AGGREGATION (AQE does not split hot groupBy keys), or (b) the
  * plan must be skew-proof regardless of runtime stats.
  */
object SkewJoin {

  /** Equi-join where the left side's `key` is skewed: the left salts each
    * row deterministically from `leftUnique` (any high-cardinality
    * column), the right replicates `salts`× so every (key, salt) shard
    * joins locally. Hot keys spread over `salts` reducers; output equals
    * the plain join. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftUnique: String,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftUnique)), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l("__salt") === r("__salt") && l(key) === r(key), joinType)
      .drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for hot grouping keys:
    * phase 1 aggregates within (key, salt) — bounded reducer input even if
    * one key dominates the table — phase 2 merges the ≤`salts` partials
    * per key. Supported merges: count / sum / min / max (the algebraic
    * ones that re-aggregate losslessly). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      uniqueCol: String,
      aggs: Seq[(String, String)], // (column, fn) with fn ∈ count|sum|min|max
      salts: Int = 16): DataFrame = {
    def phase1(c: String, fn: String): Column = fn match {
      case "count" => count(col(c))
      case "sum"   => sum(col(c))
      case "min"   => min(col(c))
      case "max"   => max(col(c))
    }
    def phase2(c: String, fn: String): Column = fn match {
      case "count" | "sum" => sum(col(s"${c}_$fn"))
      case "min"           => min(col(s"${c}_$fn"))
      case "max"           => max(col(s"${c}_$fn"))
    }
    val partial = df
      .withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head match { case (c, f) => phase1(c, f).as(s"${c}_$f") },
        aggs.tail.map { case (c, f) => phase1(c, f).as(s"${c}_$f") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head match { case (c, f) => phase2(c, f).as(s"${c}_$f") },
        aggs.tail.map { case (c, f) => phase2(c, f).as(s"${c}_$f") }: _*)
  }
}
