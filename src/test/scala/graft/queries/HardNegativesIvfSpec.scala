package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** q166b — hard-negative mining through the persisted IVF index: the
  * scale sibling of q166's deliberately-brute oracle baseline. Pins the
  * recall floor vs the exact answer and the plan shape that makes it
  * 100 TB-safe (no all-pairs, no unbounded broadcast of the query side).
  */
class HardNegativesIvfSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    Queries.all.find(_.name == name).get.fn(spark, sf)

  test("q166b top-1 agreement with exact q166 is >= 0.8; cosines match " +
      "where the pick agrees") {
    val exact = run("q166_hard_negatives").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = run("q166b_hard_negatives_ivf").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(exact.nonEmpty)
    // Coverage: a query drops out only when all its k IVF candidates
    // share its label — rare; demand >= 90% coverage.
    val covered = exact.keySet.intersect(approx.keySet)
    assert(covered.size >= (exact.size * 9) / 10,
      s"coverage ${covered.size}/${exact.size}")
    // Recall floor: the index path picks the true hardest negative for
    // at least 80% of the queries it answers.
    val agree = covered.count(q => approx(q)._1 == exact(q)._1)
    val recall = agree.toDouble / covered.size
    assert(recall >= 0.8, s"top-1 agreement $recall ($agree/${covered.size})")
    // Where the pick agrees, the scored cosine is the same number
    // (same array_dot fold, same 4dp rounding).
    covered.filter(q => approx(q)._1 == exact(q)._1).foreach { q =>
      assert(math.abs(approx(q)._2 - exact(q)._2) < 1e-9, s"query $q")
    }
  }

  test("q166b plans no cartesian product; the only nested loops are the " +
      "nCells-row centroid crosses") {
    val plan = run("q166b_hard_negatives_ivf")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // The centroid table (nCells rows) crosses once for probe selection
    // and once more inside the DPP subquery — both driver-bounded.
    // Anything beyond that would mean an unbounded side went nested-loop.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 2, s"$bnlj nested loops:\n$plan")
  }

  test("with broadcast disabled, the posting-probe join exchanges on cell " +
      "(co-partitioned shuffle join) and the posting scan is DPP-pruned") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = run("q166b_hard_negatives_ivf")
        .queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(cell"),
        s"expected a cell-keyed exchange in:\n$plan")
      // The cells scan carries a dynamic partition filter from the probe
      // set — unprobed cell directories are never read.
      assert(plan.contains("dynamicpruningexpression(cell"),
        s"expected dynamic cell pruning in:\n$plan")
      assert(!plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set(key, prev)
  }

  test("batchQuery at full probe agrees exactly with the broadcast query " +
      "path (same candidates, same scores, same tie-breaks)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("ivfbq").toString + "/idx"
    graft.ext.IvfIndex.build(spark, emb, dir, nCells = 8, iters = 2)
    val qs = emb.filter(org.apache.spark.sql.functions.col("vec_id") <= 5)
    val a = graft.ext.IvfIndex.query(spark, dir, qs, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val b = graft.ext.IvfIndex.batchQuery(spark, dir, qs, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(a == b)
  }

  test("q166 brute anchor bounds its query side past 10k vectors: exactly " +
      "the 32 md5-lowest queries, each still scored against the FULL corpus") {
    import org.apache.spark.sql.functions._
    val sqlc = spark
    import sqlc.implicits._
    val n = 10050
    // Deterministic synthetic corpus just over the bound (the fixture
    // scales never cross it — VERDICT r11 #2's branch needs live coverage).
    val dir = java.nio.file.Files.createTempDirectory("q166bound").toString
    spark.range(1, n + 1).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)), j =>
          sin(col("vec_id") * 31 + j).cast("float")).as("embedding"),
        pmod(col("vec_id"), lit(5)).cast("int").as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Queries.all.find(_.name == "q166_hard_negatives").get
      .fn(spark, dir).collect()
    assert(out.length == 32, s"expected 32 sampled queries, got ${out.length}")
    // The sample is the md5_60("q166q_<id>")-lowest 32 — recompute
    // independently through the same portable hash.
    val expected = spark.range(1, n + 1).toDF("vec_id")
      .orderBy(graft.functions.HashFunctions.md5Hash60(
        concat(lit("q166q_"), col("vec_id"))), col("vec_id"))
      .limit(32).collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == expected)
    // Full-corpus scoring: spot-check 3 sampled queries against a
    // driver-side brute pass over ALL n vectors.
    def vec(id: Long): Array[Double] =
      Array.tabulate(64)(j => math.sin(id * 31.0 + j).toFloat.toDouble)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    out.sortBy(_.getLong(0)).take(3).foreach { r =>
      val q = r.getLong(0); val qv = vec(q); val qLabel = q % 5
      val best = (1L to n.toLong).filter(_ % 5 != qLabel)
        .map(c => (cos(vec(c), qv), c)).maxBy { case (cz, c) => (cz, -c) }
      assert(r.getLong(1) == best._2, s"query $q neg_id")
      assert(math.abs(r.getDouble(2) -
        math.floor(best._1 * 10000 + 0.5) / 10000) <= 1e-4, s"query $q cos")
    }
  }
}
