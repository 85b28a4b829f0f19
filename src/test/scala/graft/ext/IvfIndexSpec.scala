package graft.ext

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Build-once/query-many IVF index: correctness vs the inline operator and
  * the partition-pruning contract (only probed cells are scanned). */
class IvfIndexSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("index query scores agree with brute force; partitions are pruned") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Files.createTempDirectory("ivf").toString + "/idx"
    IvfIndex.build(spark, emb, dir, nCells = 8, iters = 2)

    val queries = emb.filter($"vec_id" <= 3)
    val out = IvfIndex.query(spark, dir, queries, k = 10, nProbe = 3)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got.nonEmpty)

    val exact = SimilarityOps.bruteForceKnn(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val shared = got.keySet.intersect(exact.keySet)
    assert(shared.nonEmpty)
    shared.foreach { k => assert(math.abs(got(k) - exact(k)) < 1e-9) }

    // Pruning contract: the posting scan carries a partition filter on
    // cell, so unprobed cell directories are never read.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected a cell partition filter in:\n$plan")
  }

  test("cell-count scaling contract: recommendedCells is ~sqrt(N) with the " +
      "16 floor, and batchQuery's shuffle-key domain tracks nCells") {
    // sizing shape (the 100 TB story: parallelism must grow with the corpus)
    assert(IvfIndex.recommendedCells(0L) == 16)
    assert(IvfIndex.recommendedCells(100L) == 16)
    assert(IvfIndex.recommendedCells(1000000L) == 1000)
    assert(IvfIndex.recommendedCells(100000000L) == 10000)
    assert(IvfIndex.recommendedCells(10000000000L) == 100000)
    // batchQuery reducers are bounded by non-empty cells (the join keys
    // on `cell` alone): two indexes over the SAME corpus must expose a
    // shuffle-key domain that grows with nCells — the executable form of
    // "size nCells with the corpus, or the join can't scale out".
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def nonEmptyCells(nCells: Int): Long = {
      val dir = Files.createTempDirectory(s"ivf_cells_$nCells")
        .toString + "/idx"
      IvfIndex.build(spark, emb, dir, nCells = nCells, iters = 2)
      spark.read.parquet(s"$dir/cells").select("cell").distinct().count()
    }
    val small = nonEmptyCells(4)
    val large = nonEmptyCells(16)
    assert(small <= 4 && large <= 16)
    assert(large > small,
      s"shuffle-key domain must track nCells: nCells=4 -> $small cells, " +
        s"nCells=16 -> $large cells")
  }

  test("recall against brute force grows monotonically with nProbe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Files.createTempDirectory("ivf3").toString + "/idx"
    IvfIndex.build(spark, emb, dir, nCells = 8, iters = 2)
    val queries = emb.filter($"vec_id" <= 3)
    val exact = SimilarityOps.bruteForceKnn(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(nProbe: Int): Double = {
      val got = IvfIndex.query(spark, dir, queries, k = 10, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val r1 = recall(1); val r4 = recall(4); val r8 = recall(8)
    // Probe sets are nested (top-1 ⊂ top-4 ⊂ all-8 cells), so candidates —
    // and thus recall — can only grow; at nProbe = nCells it is exhaustive.
    assert(r1 <= r4 && r4 <= r8, s"recall not monotone: $r1, $r4, $r8")
    assert(r8 == 1.0, s"full probe should be exhaustive, got $r8")
  }

  test("append: recall matches a rebuild; untouched cells stay byte-identical") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val extra = emb.filter($"vec_id" % 5 === 0)
    val dirA = Files.createTempDirectory("ivfa").toString + "/idx"
    IvfIndex.build(spark, base, dirA, nCells = 8, iters = 2)

    val before = new java.io.File(s"$dirA/cells").listFiles()
      .filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().filter(_.isFile)
          .map(f => (f.getName, f.length, f.lastModified)).toSet
      }.toMap

    val stats = IvfIndex.append(spark, extra, dirA)
    assert(stats.appended == extra.count())
    assert(stats.meanAssignCos >= -1.0 && stats.meanAssignCos <= 1.0)

    // Nothing lost: the merged layout holds exactly base + extra rows.
    val cells = spark.read.parquet(s"$dirA/cells")
    assert(cells.count() == emb.count())
    assert(cells.select("vec_id").distinct().count() == emb.count())

    // Cells that received no appended vector keep byte-identical files.
    val touchedCells = cells.join(extra.select("vec_id"), "vec_id")
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(touchedCells.size == stats.cellsTouched)
    before.foreach { case (dirName, st) =>
      val cellId = dirName.stripPrefix("cell=").toInt
      if (!touchedCells.contains(cellId)) {
        val after = new java.io.File(s"$dirA/cells/$dirName").listFiles()
          .filter(_.isFile).map(f => (f.getName, f.length, f.lastModified)).toSet
        assert(after == st, s"untouched cell $cellId was rewritten")
      }
    }

    // Exhaustive probe: appended index and a full rebuild agree EXACTLY
    // with brute force (nothing about the merge loses or corrupts rows).
    val queries = emb.filter($"vec_id" <= 3)
    val exact = SimilarityOps.bruteForceKnn(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val appendedFull = IvfIndex.query(spark, dirA, queries, k = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(appendedFull == exact)

    // Moderate probe: recall after append tracks recall after rebuild
    // (different centroids — base-only vs full — so equality is not
    // required, but the append must not crater recall).
    val dirB = Files.createTempDirectory("ivfb").toString + "/idx"
    IvfIndex.build(spark, emb, dirB, nCells = 8, iters = 2)
    def recall(dir: String): Double = {
      val got = IvfIndex.query(spark, dir, queries, k = 10, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val (ra, rb) = (recall(dirA), recall(dirB))
    assert(ra >= rb - 0.25, s"append recall $ra craters vs rebuild $rb")
  }

  test("append refuses a re-appended vec_id that moved cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Files.createTempDirectory("ivfm").toString + "/idx"
    IvfIndex.build(spark, emb, dir, nCells = 8, iters = 2)
    // Re-append vec_id 0 with ANOTHER row's embedding: if it assigns to a
    // different cell, the old posting would silently survive as a
    // duplicate — append must refuse loudly instead.
    val dim = emb.select("embedding").head().getSeq[Any](0).size
    val cells = spark.read.parquet(s"$dir/cells")
    val cellOf = (id: Long) => cells.filter($"vec_id" === id)
      .select("cell").head().getInt(0)
    // find a donor row living in a different cell than vec_id 0
    val donor = cells.filter($"cell" =!= cellOf(0))
      .select("vec_id").head().getLong(0)
    val moved = emb.filter($"vec_id" === donor)
      .select(org.apache.spark.sql.functions.lit(0L).as("vec_id"),
        $"embedding")
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, moved, dir)
    }
    assert(e.getMessage.contains("rebuild"))
    assert(dim > 0)
    // the refusal happened BEFORE any write: still exactly one posting
    assert(spark.read.parquet(s"$dir/cells")
      .filter($"vec_id" === 0L).count() == 1)
  }

  test("append: empty batch is a no-op") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Files.createTempDirectory("ivfe").toString + "/idx"
    IvfIndex.build(spark, emb, dir, nCells = 4, iters = 1)
    val n = spark.read.parquet(s"$dir/cells").count()
    val stats = IvfIndex.append(spark, emb.filter($"vec_id" < 0), dir)
    assert(stats == IvfAppendStats(0L, 0, Double.NaN) ||
      (stats.appended == 0L && stats.cellsTouched == 0))
    assert(spark.read.parquet(s"$dir/cells").count() == n)
  }

  test("cells layout holds one directory per cell") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Files.createTempDirectory("ivf2").toString + "/idx"
    IvfIndex.build(spark, emb, dir, nCells = 4, iters = 1)
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(cellDirs.nonEmpty && cellDirs.length <= 4)
  }
}
