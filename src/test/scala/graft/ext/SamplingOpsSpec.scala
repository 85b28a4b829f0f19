package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Determinism and hand-computed cases for the sampling/mixing operators
  * (q69/q70's DuckDB oracles prove the cross-engine half). */
class SamplingOpsSpec extends AnyFunSuite with SparkTestBase {

  test("stratifiedSample: keeps exactly the rows whose bucket clears its rate") {
    val sql = spark
    import sql.implicits._
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val kept = SamplingOps.stratifiedSample(df, "id", "grp",
      Map("a" -> 30), defaultPct = 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.nonEmpty && kept.forall(_._2 == "a"))
    val expected = (0L until 1000L)
      .filter(i => i % 2 == 0 && ((i * 2654435761L) % 4294967296L) % 100 < 30)
    assert(kept.map(_._1).sorted.toSeq == expected)
    // ~30% of the 'a' stratum in expectation (500 rows → generous bounds):
    assert(kept.length > 100 && kept.length < 250)
  }

  test("stratifiedSample: stable under repartition; plan has no shuffle") {
    val sql = spark
    import sql.implicits._
    val df = (0L until 500L).map(i => (i, "x")).toDF("id", "grp")
    val once = SamplingOps.stratifiedSample(df, "id", "grp", Map("x" -> 40))
    val again = SamplingOps.stratifiedSample(
      df.repartition(7), "id", "grp", Map("x" -> 40))
    assert(once.collect().map(_.getLong(0)).sorted.toSeq ==
      again.collect().map(_.getLong(0)).sorted.toSeq)
    assert(!once.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sourceMixWeights: hand-computed sqrt rebalance, max source at 1.0") {
    val sql = spark
    import sql.implicits._
    val df = (Seq.fill(100)("big") ++ Seq.fill(25)("small") ++ Seq.fill(4)("tiny"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "src")
    val out = SamplingOps.sourceMixWeights(df, "src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // sqrt(100/100)=1, sqrt(25/100)=0.5, sqrt(4/100)=0.2
    assert(out == Seq(("big", 100L, 1.0), ("small", 25L, 0.5),
      ("tiny", 4L, 0.2)))
  }

  test("epochUpsample: copy counts from the stratum ratio, capped; rows multiplied") {
    val sql = spark
    import sql.implicits._
    val df = (Seq.fill(8)("big") ++ Seq.fill(2)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "src")
    // alpha=1: big -> 8/8 = 1 copy; small -> 8/2 = 4 copies.
    val out = SamplingOps.epochUpsample(df, "src", alpha = 1.0, cap = 8)
    val perSrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc == Map("big" -> 8L, "small" -> 8L)) // equalized
    // copy_idx enumerates 1..n_copies for every row
    val idxs = out.filter($"src" === "small" && $"id" === 8L)
      .select("copy_idx").collect().map(_.getInt(0)).sorted
    assert(idxs.toSeq == Seq(1, 2, 3, 4))
    // the cap bounds the multiplier
    val capped = SamplingOps.epochUpsample(df, "src", alpha = 1.0, cap = 2)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped == Map("big" -> 8L, "small" -> 4L))
  }
}
