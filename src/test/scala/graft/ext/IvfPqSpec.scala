package graft.ext

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** IVF-PQ specs: layout + deterministic rebuild, the partition-pruning
  * contract on the probed-cells scan, recall floors vs the exact scan,
  * and the residual-coding advantage over plain PQ at the same code
  * budget. Everything runs on the real sf0.001 embeddings (500 × 64,
  * unit-norm). */
class IvfPqSpec extends AnyFunSuite with SparkTestBase {
  private lazy val sqlc = spark
  import sqlc.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def exactTop10: Map[Long, Set[Long]] = {
    val all = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    (0L to 4L).map { qid =>
      qid -> (all - qid).toSeq
        .map { case (id, v) => (l2(all(qid), v), id) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap
  }

  private def recall(got: Map[Long, Set[Long]]): Double = {
    val exact = exactTop10
    val r = (0L to 4L).map(q => (got(q) & exact(q)).size.toDouble / 10)
    r.sum / r.size
  }

  private def queryRecall(dir: String, nProbe: Int): Double =
    recall(IvfPq.query(spark, dir, emb.filter($"vec_id" <= 4),
      k = 10, nProbe = nProbe)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap)

  test("build writes the composed layout; rebuild is bit-deterministic") {
    val dir = Files.createTempDirectory("ivfpq1").toString + "/idx"
    IvfPq.build(spark, emb, dir, nCells = 8, m = 16, k = 16, iters = 2)
    assert(spark.read.parquet(s"$dir/centroids").count() == 8L)
    assert(spark.read.parquet(s"$dir/codebooks").count() == 16L * 16L)
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() == 500L)
    assert(cells.select("vec_id").distinct().count() == 500L)
    val codes = cells.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
        r.getInt(r.fieldIndex("cell")))).sortBy(_._1)
    val dir2 = Files.createTempDirectory("ivfpq2").toString + "/idx"
    IvfPq.build(spark, emb, dir2, nCells = 8, m = 16, k = 16, iters = 2)
    val codes2 = spark.read.parquet(s"$dir2/cells").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
        r.getInt(r.fieldIndex("cell")))).sortBy(_._1)
    assert(codes.toSeq == codes2.toSeq)
  }

  test("query reads only probed cells (partition filter) and ranks ascending") {
    val dir = Files.createTempDirectory("ivfpq3").toString + "/idx"
    IvfPq.build(spark, emb, dir, nCells = 8, m = 16, k = 16, iters = 2)
    val out = IvfPq.query(spark, dir, emb.filter($"vec_id" === 0L),
      k = 5, nProbe = 2)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 5 && rows.forall(_._3 != 0L)) // self excluded
    assert(rows.sortBy(_._2).map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    // Pruning contract: the posting scan carries a partition filter on
    // cell, so unprobed cell directories are never read.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected a cell partition filter in:\n$plan")
  }

  test("recall: floor at full probe; residual coding beats plain PQ; nProbe helps") {
    val dir = Files.createTempDirectory("ivfpq4").toString + "/idx"
    IvfPq.build(spark, emb, dir, nCells = 16, m = 32, k = 32, iters = 3)
    val rAll = queryRecall(dir, nProbe = 16)
    val rFew = queryRecall(dir, nProbe = 4)
    assert(rAll >= 0.5, s"full-probe recall@10 $rAll")
    assert(rAll >= rFew - 1e-9, s"probing all cells ($rAll) lost vs 4 ($rFew)")
    assert(rFew >= 0.2, s"nProbe=4 recall@10 $rFew") // 4/16 of the IO

    // Residual advantage at a TIGHT code budget (m=16, k=16): coding
    // within-cell offsets quantizes finer than coding raw vectors
    // (numpy reference: ~0.48 vs ~0.32 here).
    val dirT = Files.createTempDirectory("ivfpq5").toString + "/idx"
    IvfPq.build(spark, emb, dirT, nCells = 16, m = 16, k = 16, iters = 3)
    val rIvfPq = queryRecall(dirT, nProbe = 16)
    val cb = PqOps.trainCodebooks(emb, m = 16, k = 16, iters = 3)
    val rPlain = recall(PqOps.searchAdc(PqOps.encode(emb, cb), cb,
      emb.filter($"vec_id" <= 4), k = 10)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap)
    assert(rIvfPq >= rPlain,
      s"residual IVF-PQ recall $rIvfPq below plain PQ $rPlain")
  }

  test("append: frozen-codebook encode, untouched cells byte-identical") {
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val extra = emb.filter($"vec_id" % 5 === 0)
    val dir = Files.createTempDirectory("ivfpq6").toString + "/idx"
    IvfPq.build(spark, base, dir, nCells = 8, m = 16, k = 16, iters = 2)

    val before = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().filter(_.isFile)
          .map(f => (f.getName, f.length, f.lastModified)).toSet
      }.toMap

    val stats = IvfPq.append(spark, extra, dir)
    assert(stats.appended == extra.count())
    assert(stats.meanAssignCos >= -1.0 && stats.meanAssignCos <= 1.0)

    // Nothing lost, nothing duplicated.
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() == 500L)
    assert(cells.select("vec_id").distinct().count() == 500L)

    // Cells that received no appended vector keep byte-identical files.
    val touched = cells.join(extra.select("vec_id"), "vec_id")
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(touched.size == stats.cellsTouched)
    before.foreach { case (dirName, st) =>
      if (!touched.contains(dirName.stripPrefix("cell=").toInt)) {
        val after = new java.io.File(s"$dir/cells/$dirName").listFiles()
          .filter(_.isFile).map(f => (f.getName, f.length, f.lastModified))
          .toSet
        assert(after == st, s"untouched $dirName was rewritten")
      }
    }

    // Frozen everything ⇒ re-appending the same batch is a no-op on
    // content: codes stay bit-identical.
    val codes1 = cells.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).sortBy(_._1).toSeq
    IvfPq.append(spark, extra, dir)
    val codes2 = spark.read.parquet(s"$dir/cells").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).sortBy(_._1).toSeq
    assert(codes1 == codes2)

    // Appended index keeps a sane recall floor at full probe, and does
    // not crater vs a from-scratch rebuild on the full corpus (different
    // centroids/codebooks, so equality is not required).
    val dirB = Files.createTempDirectory("ivfpq7").toString + "/idx"
    IvfPq.build(spark, emb, dirB, nCells = 8, m = 16, k = 16, iters = 2)
    val (ra, rb) = (queryRecall(dir, nProbe = 8), queryRecall(dirB, nProbe = 8))
    assert(ra >= 0.3, s"post-append full-probe recall@10 $ra")
    assert(ra >= rb - 0.25, s"append recall $ra craters vs rebuild $rb")
  }

  test("append refuses a re-appended vec_id that moved cells") {
    val dir = Files.createTempDirectory("ivfpq8").toString + "/idx"
    IvfPq.build(spark, emb, dir, nCells = 8, m = 16, k = 16, iters = 2)
    // Give vec 0 the embedding of a vector that lives in a DIFFERENT
    // cell — the frozen assignment then moves it, which must be refused.
    val cellsDf = spark.read.parquet(s"$dir/cells")
    val cellOf = cellsDf.filter($"vec_id".isin(0L to 20L map Long.box: _*))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val donor = (1L to 20L).find(i => cellOf(i) != cellOf(0L)).get
    val moved = emb.filter($"vec_id" === donor)
      .withColumn("vec_id", lit(0L))
    val e = intercept[IllegalArgumentException] {
      IvfPq.append(spark, moved, dir)
    }
    assert(e.getMessage.contains("rebuild, not an append"))
  }
}
