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

  test("weightedSample: deterministic, partitioning-invariant, weight-sensitive") {
    val sql = spark
    import sql.implicits._
    // 200 light rows (w=1) + 20 heavy rows (w=50)
    val df = ((1L to 200L).map((_, 1.0)) ++ (201L to 220L).map((_, 50.0)))
      .toDF("id", "w")
    val a = SamplingOps.weightedSample(df, "id", "w", 30)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = SamplingOps.weightedSample(df.repartition(7), "id", "w", 30)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b) // reproducible and partitioning-invariant
    // heavy rows carry 5x the total mass of the light rows -> they must
    // dominate the sample (all 20 drawn into a k=30 sample on any
    // reasonable draw; the hash seed is fixed so this is deterministic)
    assert(a.count(_ > 200L) >= 15)
    // a different salt gives a different (but again deterministic) sample
    val c = SamplingOps.weightedSample(df, "id", "w", 30, salt = 7L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(c != a)
    assert(c.count(_ > 200L) >= 15)
    // appending rows never evicts differently-hashed history: the keys of
    // existing rows are unchanged, so the sample only changes where new
    // rows out-rank old ones
    val grown = SamplingOps.weightedSample(
      df.unionByName(Seq((900L, 0.001)).toDF("id", "w")), "id", "w", 30)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(grown == a) // near-zero-weight newcomer cannot displace anything
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

  test("sampleToTokenBudget matches a driver reference; partitioning-invariant") {
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1L to 120L).map { i =>
      (i, s"src${i % 3}", (1 to (1 + rnd.nextInt(9))).map(_ => "tok").mkString(" "))
    }
    val budget = 60L
    // driver reference: per source, order by (fib-hash, id), cumulative
    // token prefix within budget
    def fib(id: Long) = java.lang.Long.remainderUnsigned(
      id * 2654435761L % 4294967296L + 4294967296L, 4294967296L)
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      var cum = 0L
      rs.sortBy(r => (fib(r._1), r._1)).flatMap { r =>
        val n = r._3.split(" ").count(_.nonEmpty)
        cum += n
        if (cum <= budget) Some((r._1, n, cum)) else None
      }
    }.toSeq.sortBy(_._1)
    Seq(1, 7).foreach { nPart => // decisions must not depend on layout
      val df = rows.toDF("doc_id", "source", "text").repartition(nPart)
      val out = SamplingOps.sampleToTokenBudget(df, budget)
        .select("doc_id", "n_toks", "cum_toks").orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      assert(out == expected, s"with input partitions = $nPart")
    }
  }

  test("sampleToTokenBudget: null source groups together; zero budget keeps nothing") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, Option.empty[String], "a b"),
      (2L, Option.empty[String], "c d e"),
      (3L, Some("s"), "f")
    ).toDF("doc_id", "source", "text")
    val kept = SamplingOps.sampleToTokenBudget(df, 5L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L))
    assert(SamplingOps.sampleToTokenBudget(df, 0L).count() == 0L)
  }

  test("epochShuffle matches a driver reference; partitioning-invariant") {
    val sql = spark
    import sql.implicits._
    val ids = 0L until 200L
    def fib(id: Long, e: Long) = ((id + e) * 2654435761L) % 4294967296L
    def expected(e: Int) = ids.sortBy(i => (fib(i, e), i)).zipWithIndex
      .map { case (id, k) => (id, k + 1L, k / 64L, k % 64L) }
      .sortBy(_._1)
    Seq(1, 7).foreach { nPart =>
      val df = ids.toDF("doc_id").repartition(nPart)
      val out = SamplingOps.epochShuffle(df, "doc_id", 3, 64L)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.toSeq == expected(3), s"with input partitions = $nPart")
    }
  }

  test("epochShuffle: epochs permute; batches are full-size except the tail") {
    val sql = spark
    import sql.implicits._
    val df = (0L until 150L).toDF("doc_id")
    val e0 = SamplingOps.epochShuffle(df, "doc_id", 0, 32L)
      .orderBy("doc_id").collect().map(_.getLong(1))
    val e1 = SamplingOps.epochShuffle(df, "doc_id", 1, 32L)
      .orderBy("doc_id").collect().map(_.getLong(1))
    // both are permutations of 1..150, and different ones
    assert(e0.sorted.toSeq == (1L to 150L) && e1.sorted.toSeq == (1L to 150L))
    assert(!e0.sameElements(e1))
    val sizes = SamplingOps.epochShuffle(df, "doc_id", 0, 32L)
      .groupBy("batch_id").count().orderBy("batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.toSeq == Seq((0L, 32L), (1L, 32L), (2L, 32L), (3L, 32L),
      (4L, 22L)))
  }

  test("dropBottomPct: exact per-group cut; null group; 0 and 100 pct edges") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, Some("a"), 10), (2L, Some("a"), 20), (3L, Some("a"), 30),
      (4L, Some("a"), 40), (5L, Some("a"), 50),
      (6L, Some("b"), 5), (7L, Some("b"), 15),
      (8L, None, 1), (9L, None, 2)
    ).toDF("id", "grp", "q")
    // 20% of 5 = 1 dropped from a; 20% of 2 = 0 dropped from b/null
    val kept = SamplingOps.dropBottomPct(df, "grp", 20,
      Seq(col("q").asc, col("id").asc))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    // 50%: a drops 2, b drops 1, null drops 1
    val kept50 = SamplingOps.dropBottomPct(df, "grp", 50,
      Seq(col("q").asc, col("id").asc))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept50.toSeq == Seq(3L, 4L, 5L, 7L, 9L))
    assert(SamplingOps.dropBottomPct(df, "grp", 0,
      Seq(col("q").asc)).count() == 9L)
    assert(SamplingOps.dropBottomPct(df, "grp", 100,
      Seq(col("q").asc)).count() == 0L)
  }

  test("weightedSampleStratified: exact k per stratum, partition-invariant") {
    val sql = spark
    import sql.implicits._
    val df = (1L to 200L).map(i => (i, s"s${i % 4}", 10L + i % 7))
      .toDF("id", "src", "w")
    val a = SamplingOps.weightedSampleStratified(df, "id", "src", "w", k = 5)
      .select("id", "src", "__grn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a.size == 20 && a.groupBy(_._2).forall(_._2.size == 5))
    // identical selection from a reshuffled input — the sample is a pure
    // function of (ids, weights), not of physical layout
    val b = SamplingOps.weightedSampleStratified(
      df.repartition(13), "id", "src", "w", k = 5)
      .select("id", "src", "__grn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("weightedSampleStratified: a dominant weight is drawn first") {
    val sql = spark
    import sql.implicits._
    // one doc carries ~all the stratum mass: u^(1/w) -> 1 as w grows, so
    // P(rank 1) = 1e9/(1e9+99) — assert the deterministic draw agrees
    val df = ((1L to 99L).map(i => (i, "s", 1L)) :+ ((100L, "s", 1000000000L)))
      .toDF("id", "src", "w")
    val top = SamplingOps.weightedSampleStratified(df, "id", "src", "w", k = 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(100L))
  }

  test("weightedSampleStratified: small stratum yields its full population") {
    val sql = spark
    import sql.implicits._
    val df = Seq((1L, "tiny", 5L), (2L, "tiny", 9L),
      (3L, "big", 1L), (4L, "big", 1L), (5L, "big", 1L))
      .toDF("id", "src", "w")
    val got = SamplingOps.weightedSampleStratified(df, "id", "src", "w", k = 3)
    assert(got.filter(col("src") === "tiny").count() == 2L)
    assert(got.filter(col("src") === "big").count() == 3L)
  }
}
