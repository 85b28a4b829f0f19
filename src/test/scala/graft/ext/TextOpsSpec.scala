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

  test("normalizeWs: controls to spaces, runs collapsed, ends trimmed") {
    val df = Seq((1L, "a\tb\r\n  c   d \u0000e ")).toDF("doc_id", "text")
    val out = df.select(TextOps.normalizeWs(col("text")).as("n"))
      .as[String].head()
    assert(out == "a b c d e")
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

  test("stripMarkup: tags out, entities decoded once, whitespace collapsed") {
    val df = Seq(
      (1L, "<p class=\"x\">hello <b>world</b></p>"),
      (2L, "a &amp;lt; b"),        // &amp;lt; decodes to the literal &lt;
      (3L, "1 &lt; 2 &gt; 0 &nbsp;&amp; done"),
      (4L, "<br/><hr><div attr='y'>text</div>")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.stripMarkup(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "hello world")
    assert(out(2L) == "a &lt; b")
    assert(out(3L) == "1 < 2 > 0 & done")
    assert(out(4L) == "text")
  }

  test("hashClassifierScore: matches the hand-rolled hash/LCG arithmetic") {
    def tokHash(t: String): Long =
      t.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    def weight(h: Long): Long =
      (h % 1024) * 2654435761L % 2147483648L - 1073741824L
    val text = "The quick  brown Fox"
    val expected = text.toLowerCase.split(" ").filter(_.nonEmpty)
      .map(t => weight(tokHash(t))).sum
    val df = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextOps.hashClassifierScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == expected)
    assert(out(2L) == 0L) // empty doc → empty token list → zero score
  }

  test("compressionRatio: repetitive text compresses far below prose and noise") {
    val sql2 = spark
    import sql2.implicits._
    val rnd = new scala.util.Random(3)
    val repetitive = "spam ham " * 200
    val prose = "the quick brown fox jumps over a lazy dog while rain falls " +
      (1 to 40).map(i => s"sentence number $i speaks of different matters entirely")
        .mkString(" ")
    val noise = (1 to 1200).map(_ => rnd.nextPrintableChar()).mkString
    val docs = Seq((1L, repetitive), (2L, prose), (3L, noise), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out(1)._3 < 0.1, s"repetitive should crush: ${out(1)}")
    assert(out(1)._3 < out(2)._3 && out(2)._3 < out(3)._3)
    assert(out(4) == ((0, 0, 0.0)))
    // deterministic across runs
    val again = TextOps.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.map { case (k, v) => k -> v._3 } == again)
  }

  test("gopherFlags: each rule trips on its crafted violator") {
    val good = (1 to 23).map(i => s"word$i").mkString("the cat is a ", " ", "")
    val docs = Seq(
      (1L, good),                                    // passes every rule
      (2L, "the cat is a hat"),                      // too few tokens
      (3L, ("extraordinarily " * 25) + "the a"),     // mean word len > 10
      (4L, ("# # " * 15) + "the cat is a hat " + ("w " * 10)), // symbol-heavy
      (5L, ("7 " * 30) + "the a"),                   // <80% alphabetic words
      (6L, (1 to 25).map(i => s"word$i").mkString(" ")), // <2 stopwords
      (7L, null.asInstanceOf[String]))               // null text
      .toDF("doc_id", "text")
    val out = TextOps.gopherFlags(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = Seq("r_wc", "r_mwl", "r_sym", "r_alpha", "r_stop")
      .map(out(id).getAs[Int](_))
    assert(flags(1L) == Seq(1, 1, 1, 1, 1) && out(1L).getAs[Int]("keep") == 1)
    assert(flags(2L)(0) == 0 && out(2L).getAs[Int]("keep") == 0)
    assert(flags(3L)(1) == 0, s"mean word len should fail: ${flags(3L)}")
    assert(flags(4L)(2) == 0, s"symbol ratio should fail: ${flags(4L)}")
    assert(flags(5L)(3) == 0, s"alpha fraction should fail: ${flags(5L)}")
    assert(flags(6L)(4) == 0 && flags(6L).take(4) == Seq(1, 1, 1, 1))
    // null text → zero counts, fails on word count alone, never NULL flags
    assert(out(7L).getAs[Int]("n_tokens") == 0 &&
      out(7L).getAs[Int]("keep") == 0)
  }

  test("gopherFlags: integer cross-multiplied boundaries are inclusive/exclusive as documented") {
    // exactly mean 3.0 and exactly mean 10.0 pass; 80% alpha passes;
    // symbol ratio at exactly 0.1 FAILS (strict <).
    val docs = Seq(
      (1L, ("abc " * 19) + "the"),                      // 20 tokens, Σ60: mean exactly 3.0
      (2L, ("abcdefghij " * 18) + "thexxxxxxx aaaaaaaaaa"), // mean 10.0, no stop needed for r_mwl
      (3L, "# " + ("w " * 9) + "the a w w w w w w w w")) // 2 sym? no: 1 sym, 20 words → 10*1 < 20 passes
      .toDF("doc_id", "text")
    val out = TextOps.gopherFlags(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("r_mwl") == 1)
    assert(out(2L).getAs[Int]("r_mwl") == 1)
    assert(out(3L).getAs[Int]("r_sym") == 1)
    // push symbol count to exactly 10% of words: 2 syms, 20 words → fails
    val edge = Seq((9L, "# # " + ("w " * 14) + "the a w w")).toDF("doc_id", "text")
    assert(TextOps.gopherFlags(edge).head().getAs[Int]("r_sym") == 0)
  }

}
