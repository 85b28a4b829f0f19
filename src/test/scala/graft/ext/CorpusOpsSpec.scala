package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Hand-computed cases for the corpus-level operators (the DuckDB oracles
  * of q64–q67 prove the cross-engine half at sf scale). */
class CorpusOpsSpec extends AnyFunSuite with SparkTestBase {

  test("vocabTopK: counts and count-desc/token-asc tie order") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "b a b"),
      (2L, "a c  b")).toDF("doc_id", "text")
    val out = CorpusOps.vocabTopK(docs, 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // a:2 b:3 c:1 → b first; a before c only by count; ties (a=2) none here
    assert(out == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
    // k truncates after ordering:
    val top1 = CorpusOps.vocabTopK(docs, 1).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "b")
  }

  test("tfIdfTop: hand-computed tf·ln((N+1)/(df+1)) and rank ties") {
    val sql = spark
    import sql.implicits._
    // N=2. "x" only in doc 1 (tf 2, df 1): 2·ln(3/2)=0.8109… → 0.8109
    // "y" in both (df 2): 1·ln(3/3)=0 in each doc.
    val docs = Seq(
      (1L, "x y x"),
      (2L, "y z")).toDF("doc_id", "text")
    val out = CorpusOps.tfIdfTop(docs, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val d1 = out.filter(_._1 == 1L)
    assert(d1(0)._3 == "x" && math.abs(d1(0)._4 - 0.8109) < 1e-9)
    // doc 1's #2 is y at 0.0; doc 2 ranks z (ln(3/2)=0.4055) over y (0):
    assert(d1(1)._3 == "y" && d1(1)._4 == 0.0)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.map(_._3).toSeq == Seq("z", "y"))
    assert(math.abs(d2(0)._4 - 0.4055) < 1e-9)
  }

  test("contamination: planted overlap between known split ids") {
    val sql = spark
    import sql.implicits._
    // Pick ids whose Knuth bucket lands in train vs test deterministically.
    val buckets = (0L until 200L).map(i =>
      i -> ((i * 2654435761L) % 4294967296L) % 100)
    val trainId = buckets.find(_._2 < 90).get._1
    val testId = buckets.find(_._2 >= 95).get._1
    val docs = Seq(
      (trainId, "p q r s"),          // trigrams: "p q r", "q r s"
      (testId, "p q r x y z")        // trigrams: p q r | q r x | r x y | x y z
    ).toDF("doc_id", "text")
    val out = CorpusOps.contamination(docs, 3).collect()
    assert(out.length == 1 && out(0).getLong(0) == testId)
    assert(out(0).getLong(1) == 4)        // n_grams
    assert(out(0).getLong(2) == 1)        // n_hits ("p q r")
    assert(out(0).getDouble(3) == 0.25)   // 1/4
  }

  test("contamination: short doc falls back to whole-text gram") {
    val sql = spark
    import sql.implicits._
    val buckets = (0L until 200L).map(i =>
      i -> ((i * 2654435761L) % 4294967296L) % 100)
    val trainId = buckets.find(_._2 < 90).get._1
    val testId = buckets.find(_._2 >= 95).get._1
    val docs = Seq(
      (trainId, "a b"),   // < 3 tokens → single gram "a b"
      (testId, "a b")
    ).toDF("doc_id", "text")
    val out = CorpusOps.contamination(docs, 3).collect()
    assert(out.length == 1 && out(0).getLong(1) == 1 &&
      out(0).getLong(2) == 1 && out(0).getDouble(3) == 1.0)
  }

  test("contaminationBloom: no false negatives vs exact, bounded fp, same grams") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = asMap(CorpusOps.contamination(docs, 3))
    val bloom = asMap(CorpusOps.contaminationBloom(docs, 3, fpp = 0.01))
    assert(bloom.keySet == exact.keySet)
    var totalGrams = 0L
    var extra = 0L
    bloom.foreach { case (id, (ng, nh)) =>
      val (eg, eh) = exact(id)
      assert(ng == eg, s"doc $id: gram count $ng vs exact $eg")
      assert(nh >= eh, s"doc $id: bloom lost a hit (false negative)")
      totalGrams += ng
      extra += nh - eh
    }
    assert(extra.toDouble / totalGrams <= 0.05,
      s"false-positive ratio ${extra.toDouble / totalGrams} above bound")
  }

  test("contaminationBloom: plan has no join — train side is a broadcast bitmap") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = CorpusOps.contaminationBloom(docs, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.linesIterator.take(12).mkString("\n"))
  }

  test("lineDedup: drops shared lines, rebuilds in order, keeps empty docs") {
    val sql = spark
    import sql.implicits._
    // 2-token lines; "x y" opens all three docs → boilerplate at minDocs=3.
    val docs = Seq(
      (1L, "x y a b c d"),   // lines: "x y" | "a b" | "c d"
      (2L, "x y a b"),       // lines: "x y" | "a b"  ("a b" in 2 docs only)
      (3L, "x y")            // all-boilerplate doc
    ).toDF("doc_id", "text")
    val out = CorpusOps.lineDedup(docs, lineTokens = 2, minDocs = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (2L, "a b\nc d"))
    assert(out(2L) == (1L, "a b"))
    assert(out(3L) == (0L, ""))
  }

  test("redactPii: masks emails, phones, IPv4s; counts via regexp_count") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, "mail a.b-c@x.co and a@b.io call +1-555-0042 host 10.0.0.7 end"),
      (2L, "no pii here 1234 v1.2 x@y"))
      .toDF("id", "t")
    val out = df.select(
      col("id"),
      TextOps.redactPii(col("t")).as("r"),
      regexp_count(col("t"), lit(TextOps.emailRe)).as("ne"),
      regexp_count(col("t"), lit(TextOps.phoneRe)).as("np"),
      regexp_count(col("t"), lit(TextOps.ipv4Re)).as("ni"))
      .orderBy("id").collect()
    assert(out(0).getString(1) ==
      "mail <EMAIL> and <EMAIL> call <PHONE> host <IP> end")
    assert(out(0).getInt(2) == 2 && out(0).getInt(3) == 1 &&
      out(0).getInt(4) == 1)
    // "x@y" has no dot-TLD, "1.2" is not a dotted quad → untouched:
    assert(out(1).getString(1) == "no pii here 1234 v1.2 x@y")
    assert(out(1).getInt(2) == 0 && out(1).getInt(3) == 0 &&
      out(1).getInt(4) == 0)
  }

  test("tokenRarity: df from distinct in-doc tokens; rare = df <= maxDf") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, "the cat the cat zyx"), // distinct {the, cat, zyx}
      (2L, "the dog"),             // {the, dog}
      (3L, "the cat"))             // {the, cat}
      .toDF("doc_id", "text")
    // df: the→3, cat→2, zyx→1, dog→1. maxDf=1 → rare iff df=1.
    val out = CorpusOps.tokenRarity(df, maxDf = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(out == Seq(
      (1L, 3L, 1L, 6L, 0.3333), // the(3)+cat(2)+zyx(1)=6; zyx rare
      (2L, 2L, 1L, 4L, 0.5),    // the(3)+dog(1)
      (3L, 2L, 0L, 5L, 0.0)))   // the(3)+cat(2)
  }

  test("unigramLogProb: hand-computed micro-nat sums; val/train docs excluded") {
    val sql2 = spark
    import sql2.implicits._
    // id 11 hashes to the test split, id 22 to val, the rest to train
    // (Fibonacci-hash buckets 95 and 94).
    val docs = Seq(
      (1L, "a a b"), (2L, "a c"),            // train: a:3 b:1 c:1, N=5 V=3
      (11L, "a b z"),                        // test
      (22L, "ignored val words")             // val -> no output
    ).toDF("doc_id", "text")
    val out = CorpusOps.unigramLogProb(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // denom = 8; terms: ln(4/8), ln(2/8), ln(1/8) floored at 1e6
    val expected = Seq(math.log(0.5), math.log(0.25), math.log(0.125))
      .map(l => math.floor(l * 1000000).toLong).sum
    assert(out.toSeq == Seq((11L, 3L, expected)))
  }

  test("bigramLogProb: hand-computed Laplace-smoothed bigram micro-nats") {
    val sql2 = spark
    import sql2.implicits._
    // ids 1, 2 -> train; 11 -> test (same Fibonacci-hash buckets as the
    // unigram test). Train bigrams: (a,a) (a,b) | (a,c); contexts:
    // c(a) = 3; V = {a,b,c} = 3.
    val docs = Seq(
      (1L, "a a b"), (2L, "a c"),
      (11L, "a b z"),
      (22L, "ignored val words")
    ).toDF("doc_id", "text")
    val out = CorpusOps.bigramLogProb(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // test bigrams of "a b z": (a,b) cb=1 cu=3 -> ln(2/6); (b,z) cb=0,
    // b unseen as context (cu=0) -> ln(1/3).
    val expected = Seq(math.log(2.0 / 6), math.log(1.0 / 3))
      .map(l => math.floor(l * 1000000).toLong).sum
    assert(out.toSeq == Seq((11L, 2L, expected)))
  }

  test("unigramLogProb: a token-free train split fails clearly, not with an NPE") {
    val sql2 = spark
    import sql2.implicits._
    // Train-split docs (ids 1, 2) carry no tokens; the model is un-fittable
    // and must say so instead of NPE-ing on a null SUM.
    val docs = Seq((1L, ""), (2L, " "), (11L, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusOps.unigramLogProb(docs).collect()
    }
    assert(e.getMessage.contains("train split has no tokens"))
  }

  test("bm25TopK: hand-computed Okapi scores, ranks, micro-nat floors") {
    val sql = spark
    import sql.implicits._
    // docs: 1 "a b a" (dl 3), 2 "b c" (dl 2), 3 "c c c" (dl 3)
    // nd=3, sumdl=8; df: a→1, b→2, c→2
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c"))
      .toDF("doc_id", "text")
    val (k1, b) = (1.2, 0.75)
    val avgdl = 8.0 / 3
    def un(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
      val norm = 1.0 - b + b * dl / avgdl
      math.floor(idf * (tf * (k1 + 1)) / (tf + k1 * norm) * 1000000).toLong
    }
    val out = CorpusOps.bm25TopK(docs,
        Seq(1L -> Seq("a"), 2L -> Seq("b", "c")), topK = 2)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val exp = Map( // per-(query, doc) summed floored contributions
      (1L, 1L) -> un(2, 1, 3),
      (2L, 1L) -> un(1, 2, 3),
      (2L, 2L) -> (un(1, 2, 2) + un(1, 2, 2)), // b and c, both tf=1 dl=2
      (2L, 3L) -> un(3, 2, 3))
    // q1: only doc 1 matches. q2: doc 2 (two terms, short doc) outranks
    // docs 3 and 1; topK=2 keeps docs 2 and 3.
    assert(exp((2L, 2L)) > exp((2L, 3L)) && exp((2L, 3L)) > exp((2L, 1L)))
    assert(out == Seq(
      (1L, 1, 1L, exp((1L, 1L))),
      (2L, 1, 2L, exp((2L, 2L))),
      (2L, 2, 3L, exp((2L, 3L)))))
  }

  test("heavyHitters: equals the exact brute-force set on every partitioning") {
    val sql = spark
    import sql.implicits._
    // vocabulary (200 rare words) >> k (8): the Misra–Gries eviction path
    // runs for real, and the final exact filter must erase whatever the
    // candidate superset looked like per partitioning.
    val rnd = new scala.util.Random(7)
    val docs = (1 to 120).map { i =>
      val heavy = Seq.fill(6)(if (rnd.nextBoolean()) "alpha" else "beta")
      val mid = Seq.fill(2)("gamma")
      val rare = Seq.fill(4)(s"rare${rnd.nextInt(200)}")
      (i.toLong, rnd.shuffle(heavy ++ mid ++ rare).mkString(" "))
    }.toDF("doc_id", "text")
    val exploded = docs.select(
      org.apache.spark.sql.functions.explode(
        TextOps.tokens(col("text"))).as("tok"))
    val n = exploded.count()
    val brute = exploded.groupBy("tok").count()
      .where(col("count") * 8 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(brute.contains("alpha") && brute.contains("beta") &&
      !brute.keys.exists(_.startsWith("rare")))
    for (parts <- Seq(1, 3, 8)) {
      val got = CorpusOps.heavyHitters(docs.repartition(parts), k = 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == brute, s"parts=$parts: $got vs $brute")
    }
  }

  test("heavyHitters: planted majority token always survives; empty corpus yields empty") {
    val sql = spark
    import sql.implicits._
    // one token holds >50% of mass → with k=2 it is the only possible
    // survivor, and the MG guarantee says it MUST survive.
    val docs = Seq(
      (1L, "x x x x x x x a b c"),
      (2L, "x x x x x x d e f x")).toDF("doc_id", "text")
    val out = CorpusOps.heavyHitters(docs, k = 2).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x", 14L)))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusOps.heavyHitters(empty, k = 4).count() == 0)
  }

  test("perplexityBuckets: equal-frequency per-lang buckets, head = best mean, partitioning-independent") {
    val sql = spark
    import sql.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = CorpusOps.perplexityBuckets(docs, nBuckets = 3)
    val rows = out.collect()
    // every scored doc got a bucket in range
    assert(rows.nonEmpty &&
      rows.forall(r => { val b = r.getAs[Int]("bucket"); b >= 0 && b <= 2 }))
    // per-lang equal-frequency: bucket sizes within a lang differ by <= 1
    val sizes = rows.groupBy(r => (r.getAs[String]("lang"),
      r.getAs[Int]("bucket"))).view.mapValues(_.length).toMap
    for (lang <- sizes.keys.map(_._1).toSeq.distinct) {
      val s = (0 to 2).map(b => sizes.getOrElse((lang, b), 0))
      assert(s.max - s.min <= 1, s"$lang buckets skewed: $s")
    }
    // ordering contract: within a lang, every bucket-0 mean >= every
    // bucket-2 mean (head = lowest perplexity = highest mean log-prob)
    for (lang <- sizes.keys.map(_._1).toSeq.distinct) {
      val byB = rows.filter(_.getAs[String]("lang") == lang)
        .groupBy(_.getAs[Int]("bucket")).view
        .mapValues(_.map(_.getAs[Long]("mean_unats"))).toMap
      if (byB.contains(0) && byB.contains(2))
        assert(byB(0).min >= byB(2).max)
    }
    // partitioning independence: the two-phase rank must not depend on
    // the input layout
    val again = CorpusOps.perplexityBuckets(docs.repartition(7), nBuckets = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("bucket"))
      .toMap
    assert(rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Int]("bucket")).toMap == again)
  }

  test("dsirWeights: target-like docs outscore dissimilar ones; layout-independent") {
    val sql = spark
    import sql.implicits._
    // target vocabulary {aa..ae}, noise vocabulary {zz0..zz199}: a raw doc
    // drawn from the target vocabulary must weigh higher than a noise doc.
    val rnd = new scala.util.Random(11)
    def tgt() = Seq.fill(12)("a" + ('a' + rnd.nextInt(5)).toChar).mkString(" ")
    def noise() = Seq.fill(12)("zz" + rnd.nextInt(200)).mkString(" ")
    val docs = ((1 to 20).map(i => (i.toLong, "t", tgt())) ++
      (21 to 30).map(i => (i.toLong, "r", tgt())) ++   // target-like raw
      (31 to 60).map(i => (i.toLong, "r", noise())))
      .toDF("doc_id", "source", "text")
    val w = CorpusOps.dsirWeights(docs, col("source") === "t", nBuckets = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("weight_unats").toDouble / r.getAs[Long]("n_feats")))
      .toMap
    val likeMean = (21 to 30).map(i => w(i.toLong)).sum / 10
    val noiseMean = (31 to 60).map(i => w(i.toLong)).sum / 30
    assert(likeMean > noiseMean,
      s"target-like $likeMean should outscore noise $noiseMean")
    // weights are a pure function of the data, not the layout
    val again = CorpusOps.dsirWeights(docs.repartition(7),
      col("source") === "t", nBuckets = 256)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("weight_unats")).toMap
    val first = CorpusOps.dsirWeights(docs, col("source") === "t",
      nBuckets = 256)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("weight_unats")).toMap
    assert(first == again)
    // an empty target slice must fail loudly, not return garbage
    intercept[IllegalArgumentException] {
      CorpusOps.dsirWeights(docs, col("source") === "nope").collect()
    }
  }
}
