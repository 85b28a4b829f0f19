package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class TextOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("langScores: stopword overlap picks the right language") {
    val docs = Seq(
      (1L, "the cat and the dog is in a house"),
      (2L, "der hund und die katze ist nicht hier"),
      (3L, "le chat et la maison est une belle"),
      (4L, "el perro y la casa es un gato")
    ).toDF("doc_id", "text")
    val out = TextOps.langScores(docs).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("guessed_lang")).toSeq ==
      Seq("en", "de", "fr", "es"))
    assert(out(0).getAs[Int]("en_hits") == 5) // the, and, is, in, a
  }

  test("qualityFeatures: hand-computed features and composite") {
    val docs = Seq((1L, "the cat sat. the mat!")).toDF("doc_id", "text")
    val r = TextOps.qualityFeatures(docs).head()
    assert(r.getAs[Int]("n_chars") == 21)
    assert(r.getAs[Int]("n_tokens") == 5)
    assert(r.getAs[Int]("n_punct") == 2)
    assert(r.getAs[Int]("n_stop") == 2) // 'the' twice, non-distinct
    assert(r.getAs[Double]("stop_ratio") == 0.4)
    // quality = min(5/50,1) * (0.5 + 0.4/2) = 0.1 * 0.7 = 0.07
    assert(r.getAs[Double]("quality") == 0.07)
  }

  test("tokenCounts: whitespace vs BPE-ish regex") {
    val docs = Seq((1L, "ab 12 c!")).toDF("doc_id", "text")
    val r = TextOps.tokenCounts(docs).head()
    assert(r.getAs[Int]("ws_tokens") == 3)
    assert(r.getAs[Int]("bpe_tokens") == 4) // ab | 12 | c | !
  }

  test("chunk: token windows with overlap, hand-checked") {
    import graft.SparkTestBase.spark.implicits._
    val doc = Seq((1L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    // maxTokens=3, overlap=1 -> stride 2 -> starts 0,2,4,6(hmm): ceil((7-1)/2)=3 chunks
    val out = TextOps.chunk(doc, maxTokens = 3, overlap = 1)
      .orderBy("chunk_id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (0, 3, "t1 t2 t3"),
      (1, 3, "t3 t4 t5"),
      (2, 3, "t5 t6 t7")))
    // Short doc -> exactly one chunk; no overlap config:
    val one = TextOps.chunk(Seq((2L, "a b")).toDF("doc_id", "text"), 10)
      .collect().map(r => (r.getInt(1), r.getString(3)))
    assert(one.toSeq == Seq((0, "a b")))
    // Every token of a long doc appears in at least one chunk:
    val words = (1 to 57).map(i => s"w$i").mkString(" ")
    val covered = TextOps.chunk(Seq((3L, words)).toDF("doc_id", "text"),
      maxTokens = 10, overlap = 3)
      .collect().flatMap(_.getString(3).split(" ")).toSet
    assert(covered == (1 to 57).map(i => s"w$i").toSet)
  }

  test("rollingFingerprint: hand-computed polynomial hash") {
    val docs = Seq((1L, "ab"), (2L, ""), (3L, "ab")).toDF("doc_id", "text")
    val fps = docs.select(TextOps.rollingFingerprint(col("text")))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(fps(0) == 97L * 31 + 98) // 'a'=97 then *31 + 'b'=98
    assert(fps(1) == 0L) // empty fold = init
    assert(fps(0) == fps(2))
  }

  test("charEntropy: hand-computed nats on tiny docs") {
    val df = Seq((1L, "aab"), (2L, "abab"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextOps.charEntropy(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // "aab": n=3, counts a:2 b:1 → H = ln3 − (2·ln2 + 1·ln1)/3
    val h1 = math.floor((math.log(3) - (2 * math.log(2)) / 3) * 10000 + 0.5) / 10000
    assert(out(1L).getLong(1) == 3 && out(1L).getLong(2) == 2)
    assert(out(1L).getDouble(3) == h1)
    // "abab": two chars at p=1/2 each → H = ln2 exactly
    val h2 = math.floor(math.log(2) * 10000 + 0.5) / 10000
    assert(out(2L).getLong(1) == 4 && out(2L).getLong(2) == 2)
    assert(out(2L).getDouble(3) == h2)
    // single-char doc → zero entropy
    assert(out(3L).getLong(1) == 1 && out(3L).getLong(2) == 1)
    assert(out(3L).getDouble(3) == 0.0)
  }

  test("urls + urlDomain: extraction order and host normalization") {
    val df = Seq((1L, "x https://www.Foo.Example.com/p/1?a=2 y http://bar.org/z end"))
      .toDF("doc_id", "text")
    val out = df.select(org.apache.spark.sql.functions.explode(
        TextOps.urls(col("text"))).as("u"))
      .select(TextOps.urlDomain(col("u")).as("d"))
      .as[String].collect().toSeq
    assert(out == Seq("foo.example.com", "bar.org"))
  }
}
