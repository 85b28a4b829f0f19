package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Hand-computed merge rounds + the greedy-application edge cases. */
class BpeOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("trainMerges: hand-computed rounds, deterministic tie-break") {
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a b c d")
    ).toDF("doc_id", "text")
    // round 1: (a,b)=3, (b,a)=1, (b,c)=2, (c,d)=1 -> merge (a,b)
    // round 2: (a_b,a_b)=1, (a_b,c)=2, (c,d)=1    -> merge (a_b,c)
    // round 3: (a_b,a_b_c)=1, (a_b_c,d)=1 -> lexicographic tie-break
    //          -> (a_b,a_b_c)
    val (merges, out) = BpeOps.trainMerges(docs, 3)
    assert(merges == Seq(("a", "b", 3L), ("a_b", "c", 2L),
      ("a_b", "a_b_c", 1L)))
    val toks = out.orderBy("doc_id").collect()
      .map(_.getSeq[String](out.columns.indexOf("tokens")))
    assert(toks(0) == Seq("a_b_a_b_c"))
    assert(toks(1) == Seq("a_b_c", "d"))
  }

  test("greedy left-to-right application on overlapping runs") {
    val docs = Seq((1L, "a a a")).toDF("doc_id", "text")
    val (merges, out) = BpeOps.trainMerges(docs, 1)
    assert(merges == Seq(("a", "a", 2L)))
    assert(out.head().getSeq[String](out.columns.indexOf("tokens"))
      == Seq("a_a", "a"))
  }

  test("stops early when no pairs remain; single-token docs untouched") {
    val docs = Seq((1L, "only"), (2L, "x y")).toDF("doc_id", "text")
    val (merges, out) = BpeOps.trainMerges(docs, 5)
    assert(merges == Seq(("x", "y", 1L))) // round 2 finds nothing
    val toks = out.orderBy("doc_id").collect()
      .map(_.getSeq[String](out.columns.indexOf("tokens")))
    assert(toks(0) == Seq("only"))
    assert(toks(1) == Seq("x_y"))
  }

  test("regex metacharacters in tokens are quoted in pattern and replacement") {
    val docs = Seq((1L, "a$b c* a$b c*")).toDF("doc_id", "text")
    val (merges, out) = BpeOps.trainMerges(docs, 1)
    assert(merges.head._1 == "a$b")
    assert(out.head().getSeq[String](out.columns.indexOf("tokens"))
      == Seq("a$b_c*", "a$b_c*"))
  }

  test("batched ≡ sequential when the top pairs are token-disjoint") {
    // Four token-disjoint high-frequency pairs with distinct counts,
    // separated by unique filler so a merge never creates a pair that
    // outranks the remaining picks — the regime where batching is exact.
    val docs = Seq(
      (1L, "a b p1 a b p2 a b p3 a b p4 a b"),
      (2L, "c d q1 c d q2 c d q3 c d"),
      (3L, "e f r1 e f r2 e f"),
      (4L, "g h s1 g h")
    ).toDF("doc_id", "text")
    val (seqMerges, seqOut) = BpeOps.trainMerges(docs, 4)
    val (batMerges, batOut, rounds) = BpeOps.trainMergesBatched(docs, 4, batch = 4)
    assert(batMerges == seqMerges)
    assert(batMerges.map(m => (m._1, m._2)) ==
      Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")))
    assert(batMerges.map(_._3) == Seq(5L, 4L, 3L, 2L))
    val toks = (df: org.apache.spark.sql.DataFrame) => df.orderBy("doc_id")
      .collect().map(_.getSeq[String](df.columns.indexOf("tokens"))).toSeq
    assert(toks(batOut) == toks(seqOut))
    // The whole vocabulary trained in ONE corpus pass instead of four:
    assert(rounds == 1)
  }

  test("batched defers conflicting pairs to the next round") {
    // (a,b) count 5 and (b,c) count 3 share token b: the round-1 batch may
    // only take (a,b); (b,c) no longer exists after the merge (it became
    // (a_b, c)), so round 2 must re-count rather than apply a stale pair.
    val docs = Seq(
      (1L, "a b c a b c a b c a b a b")
    ).toDF("doc_id", "text")
    val (merges, out, rounds) = BpeOps.trainMergesBatched(docs, 2, batch = 2)
    assert(rounds == 2)
    assert(merges.map(m => (m._1, m._2)) == Seq(("a", "b"), ("a_b", "c")))
    assert(out.head().getSeq[String](out.columns.indexOf("tokens"))
      == Seq("a_b_c", "a_b_c", "a_b_c", "a_b", "a_b"))
  }

  test("applyMerges encodes the training corpus to the training result") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val (merges, trained) = BpeOps.trainMerges(docs, 3)
    val encoded = BpeOps.applyMerges(docs, merges.map(m => (m._1, m._2)))
    val toks = (df: org.apache.spark.sql.DataFrame) => df.orderBy("doc_id")
      .collect().map(_.getSeq[String](df.columns.indexOf("tokens"))).toSeq
    assert(toks(encoded) == toks(trained))
    // Fresh text encodes with the same chained merges (a_b then a_b_c):
    val fresh = Seq((9L, "a b c a b x")).toDF("doc_id", "text")
    val out = BpeOps.applyMerges(fresh, merges.map(m => (m._1, m._2)))
    assert(out.head().getSeq[String](out.columns.indexOf("tokens"))
      == Seq("a_b_c", "a_b", "x"))
  }

  test("batch=1 matches trainMerges decisions exactly") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val (seqMerges, _) = BpeOps.trainMerges(docs, 3)
    val (batMerges, _, rounds) = BpeOps.trainMergesBatched(docs, 3, batch = 1)
    assert(batMerges == seqMerges && rounds == 3)
  }
}
