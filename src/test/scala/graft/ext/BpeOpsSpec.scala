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
}
