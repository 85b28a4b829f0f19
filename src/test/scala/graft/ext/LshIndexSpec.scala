package graft.ext

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Persisted LSH index: query parity with the inline operator, partition
  * pruning, and the EXACT append ≡ rebuild equivalence (no trained state —
  * hash-defined buckets make incremental maintenance lossless). */
class LshIndexSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("query matches the inline lshKnn exactly; probed partitions pruned") {
    val dir = Files.createTempDirectory("lsh").toString + "/idx"
    LshIndex.build(spark, emb, dir, planes = 6, tables = 2)
    val queries = emb.filter($"vec_id" <= 3)
    val out = LshIndex.query(spark, dir, queries, k = 10)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val inline = SimilarityOps.lshKnn(emb, queries, k = 10, planes = 6, tables = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.nonEmpty && got == inline)

    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [tb"),
      s"expected a tb partition filter in:\n$plan")
  }

  test("append equals a full rebuild EXACTLY — postings and query results") {
    val base = emb.filter($"vec_id" % 4 =!= 0)
    val extra = emb.filter($"vec_id" % 4 === 0)
    val dirA = Files.createTempDirectory("lsha").toString + "/idx"
    val dirB = Files.createTempDirectory("lshb").toString + "/idx"
    LshIndex.build(spark, base, dirA, planes = 6, tables = 2)
    LshIndex.build(spark, emb, dirB, planes = 6, tables = 2)

    val before = new java.io.File(s"$dirA/postings").listFiles()
      .filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().filter(_.isFile)
          .map(f => (f.getName, f.length, f.lastModified)).toSet
      }.toMap

    val stats = LshIndex.append(spark, extra, dirA)
    assert(stats.appended == extra.count())
    assert(stats.postingsAdded == extra.count() * 2) // one per table

    // Postings identical to the rebuild's, row for row.
    val read = (d: String) => spark.read.parquet(s"$d/postings")
      .select("vec_id", "tb").collect().map(r => (r.getLong(0), r.getInt(1)))
      .sorted.toSeq
    assert(read(dirA) == read(dirB))

    // Untouched bucket partitions keep byte-identical files.
    val touched = spark.read.parquet(s"$dirA/postings")
      .join(extra.select("vec_id"), "vec_id")
      .select("tb").distinct().collect().map(_.getInt(0)).toSet
    assert(touched.size == stats.bucketsTouched)
    before.foreach { case (dirName, st) =>
      val tb = dirName.stripPrefix("tb=").toInt
      if (!touched.contains(tb)) {
        val after = new java.io.File(s"$dirA/postings/$dirName").listFiles()
          .filter(_.isFile).map(f => (f.getName, f.length, f.lastModified)).toSet
        assert(after == st, s"untouched bucket $tb was rewritten")
      }
    }

    // Query results identical on appended vs rebuilt index.
    val queries = emb.filter($"vec_id" <= 5)
    val q = (d: String) => LshIndex.query(spark, d, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(q(dirA) == q(dirB))
  }

  test("append of an empty batch is a no-op; params survive round-trips") {
    val dir = Files.createTempDirectory("lshe").toString + "/idx"
    LshIndex.build(spark, emb, dir, planes = 5, tables = 3)
    val n = spark.read.parquet(s"$dir/postings").count()
    assert(n == emb.count() * 3)
    val stats = LshIndex.append(spark, emb.filter($"vec_id" < 0), dir)
    assert(stats == LshAppendStats(0L, 0L, 0))
    assert(spark.read.parquet(s"$dir/postings").count() == n)
  }
}
