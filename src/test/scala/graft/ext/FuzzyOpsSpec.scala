package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Deletion-neighborhood fuzzy join: hand-computed variants, planted pair
  * sets (incl. the "ab"/"ba" overgeneration case the verify step must
  * kill), and a brute-force equivalence sweep (the q105 DuckDB oracle
  * proves the same property at sf scale against the quadratic join). */
class FuzzyOpsSpec extends AnyFunSuite with SparkTestBase {

  test("del1Variants: the string plus each single-deletion, deduped") {
    val sql = spark
    import sql.implicits._
    val out = Seq(("abc"), ("aab"), ("")).toDF("s")
      .select(col("s"), FuzzyOps.del1Variants(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("abc") == Seq("abc", "bc", "ac", "ab"))
    // deleting either 'a' of "aa…" collapses to one variant:
    assert(out("aab") == Seq("aab", "ab", "aa"))
    assert(out("") == Seq(""))
  }

  test("selfJoinEd1: planted pairs — subs, indels, exact dups; d2 excluded") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, "kitten"), (2L, "sitten"), (3L, "sittin"), (4L, "kitte"),
      (5L, "ab"), (6L, "ba"), // share variant "b"/"a" but distance 2
      (7L, "kitten"),         // exact duplicate of 1
      (8L, null.asInstanceOf[String])
    ).toDF("id", "name")
    val out = FuzzyOps.selfJoinEd1(df, "id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq(
      (1L, 2L, 1), (1L, 4L, 1), (1L, 7L, 0),
      (2L, 3L, 1), (2L, 7L, 1), (4L, 7L, 1)))
  }

  test("selfJoinEd1 equals the brute-force quadratic join") {
    val sql = spark
    import sql.implicits._
    // Deterministic pseudo-random short strings over {a,b}: dense enough
    // in edit space that subs, indels, dups, and d≥2 pairs all occur.
    val rng = new scala.util.Random(42)
    val strs = (1L to 60L).map { i =>
      i -> (0 until (2 + rng.nextInt(3))).map(_ =>
        if (rng.nextBoolean()) 'a' else 'b').mkString
    }
    val df = strs.toDF("id", "name")
    val fast = FuzzyOps.selfJoinEd1(df, "id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = df.select(col("id").as("a_id"), col("name").as("a_s"))
    val b = df.select(col("id").as("b_id"), col("name").as("b_s"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .withColumn("d", levenshtein(col("a_s"), col("b_s")))
      .where(col("d") <= 1)
      .select(col("a_id"), col("b_id"), col("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty && fast == brute)
  }

  test("sortedNeighborhoodPairs: exactly the gap ≤ w pairs, once each") {
    val sql = spark
    import sql.implicits._
    // sort by v: ranks 1..8; ids shuffled so id order ≠ rank order.
    val df = Seq((5L, "e"), (1L, "a"), (8L, "h"), (3L, "c"), (2L, "b"),
      (7L, "g"), (4L, "d"), (6L, "f")).toDF("id", "v")
    val w = 3
    val got = FuzzyOps.sortedNeighborhoodPairs(df, "id", "v", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // v is alphabetical and ids follow it, so rank(id) = id here.
    val exp = (for {
      a <- 1L to 8L; b <- a + 1 to math.min(a + w, 8L)
    } yield (a, b, b - a)).toSet
    assert(got == exp)
    // exactly once each (the two block-token cases are disjoint):
    val n = FuzzyOps.sortedNeighborhoodPairs(df, "id", "v", w).count()
    assert(n == exp.size)
  }

  test("degenerate-bucket guard drops capped keys; plan has no cartesian") {
    val sql = spark
    import sql.implicits._
    val df = Seq((1L, "aa"), (2L, "ab"), (3L, "ba")).toDF("id", "name")
    // every bucket here has ≥2 members → maxBucket=1 kills them all
    assert(FuzzyOps.selfJoinEd1(df, "id", "name", maxBucket = 1)
      .collect().isEmpty)
    val plan = FuzzyOps.selfJoinEd1(df, "id", "name")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
