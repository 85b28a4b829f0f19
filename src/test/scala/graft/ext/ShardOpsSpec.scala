package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import scala.util.Random

/** Global-rank correctness + shard balance for [[ShardOps]] (q72's DuckDB
  * oracle proves the cross-engine half on documents). */
class ShardOpsSpec extends AnyFunSuite with SparkTestBase {

  test("withGlobalRank equals a single-partition row_number, incl. ties") {
    val sql = spark
    import sql.implicits._
    val rnd = new Random(7)
    // Many ties in `size` — ranks must still form a total order.
    val rows = (1L to 2000L).map(i => (i, rnd.nextInt(20).toLong))
    val df = rows.toDF("id", "size").repartition(13)
    val got = ShardOps.withGlobalRank(df, Seq(col("size").desc, col("id").asc))
      .select("id", "__rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = rows.sortBy { case (id, sz) => (-sz, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("withGlobalPrefixSum equals a single-partition running SUM, incl. ties") {
    val sql = spark
    import sql.implicits._
    val rnd = new Random(11)
    val rows = (1L to 1500L).map(i => (i, rnd.nextInt(15).toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "size", "w").repartition(9)
    val got = ShardOps
      .withGlobalPrefixSum(df, Seq(col("size").desc, col("id").asc), "w")
      .select("id", "__rsum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    var cum = 0L
    val want = rows.sortBy { case (id, sz, _) => (-sz, id) }
      .map { case (id, _, w) => cum += w; id -> cum }.toMap
    assert(got == want)
  }

  test("assignShards balances size within one max-item per shard") {
    val sql = spark
    import sql.implicits._
    val rnd = new Random(42)
    // Heavy-tailed sizes — the case round-robin-by-rank is built for.
    val rows = (1L to 3000L).map(i =>
      (i, math.pow(10, rnd.nextDouble() * 4).toLong + 1))
    val out = ShardOps.assignShards(rows.toDF("id", "sz"), 8, "sz", "id")
      .groupBy("shard").agg(sum("sz").as("tot"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 8 && out.map(_._1).sorted.toSeq == (0 until 8))
    // Row counts differ by at most 1; size totals by at most the largest item.
    assert(out.map(_._3).max - out.map(_._3).min <= 1)
    val maxItem = rows.map(_._2).max
    assert(out.map(_._2).max - out.map(_._2).min <= maxItem)
  }

  test("assignment is deterministic across runs and input partitioning") {
    val sql = spark
    import sql.implicits._
    val rows = (1L to 500L).map(i => (i, (i * 37) % 100))
    val a = ShardOps.assignShards(rows.toDF("id", "sz"), 4, "sz", "id")
      .select("id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = ShardOps.assignShards(rows.toDF("id", "sz").repartition(11), 4, "sz", "id")
      .select("id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
  }

  test("withGroupRank equals per-group row_number; partitioning-invariant") {
    val sql = spark
    import sql.implicits._
    val rnd = new Random(19)
    val rows = (1L to 1500L).map(i =>
      (i, s"g${rnd.nextInt(5)}", rnd.nextInt(12).toLong)) // many ties
    val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.sortBy { case (id, _, sz) => (-sz, id) }
        .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1L) }
    }.toMap
    Seq(1, 13).foreach { nPart =>
      val df = rows.toDF("id", "grp", "sz").repartition(nPart)
      val got = ShardOps
        .withGroupRank(df, "grp", Seq(col("sz").desc, col("id").asc))
        .select("id", "__grn").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"with $nPart input partitions")
    }
  }

  test("withGroupRank: one full-data range shuffle, offsets window is summary-only") {
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val sql = spark
    import sql.implicits._
    val df = (1L to 200L).map(i => (i, s"g${i % 3}", i % 9)).toDF("id", "grp", "sz")
    val out = ShardOps.withGroupRank(df, "grp", Seq(col("sz").desc, col("id").asc))
    val rangeShuffles = out.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[RangePartitioning] => e.canonicalized
    }
    assert(rangeShuffles.nonEmpty && rangeShuffles.distinct.size == 1)
    out.collect()
    assert(out.queryExecution.executedPlan.toString.contains("ReusedExchange"))
    // The only window runs over the per-(partition, group) summary.
    val opt = out.queryExecution.optimizedPlan.toString
    val specs = "windowspecdefinition\\(([^,]+)".r
      .findAllMatchIn(opt).map(_.group(1)).toSeq
    assert(specs.nonEmpty)
    specs.foreach(s => assert(s.startsWith("__gnull#"), opt))
  }

  test("one full-data shuffle: the offsets branch reuses the range exchange") {
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val sql = spark
    import sql.implicits._
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "sz")
    val out = ShardOps.assignShards(df, 4, "sz", "id")
    // Both branches' range exchanges canonicalize identically, so AQE's
    // exchange reuse executes the full-data shuffle ONCE (the local rank is
    // a mapPartitions counter, not a Window that would re-shuffle on __pid).
    val rangeShuffles = out.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[RangePartitioning] => e.canonicalized
    }
    assert(rangeShuffles.nonEmpty && rangeShuffles.distinct.size == 1)
    out.collect()
    assert(out.queryExecution.executedPlan.toString.contains("ReusedExchange"))
    // The only window is the offsets prefix-sum over the driver-tiny
    // per-(partition, group) summary.
    val opt = out.queryExecution.optimizedPlan.toString
    val specs = "windowspecdefinition\\(([^,]+)".r
      .findAllMatchIn(opt).map(_.group(1)).toSeq
    assert(specs.nonEmpty)
    specs.foreach(s => assert(s.startsWith("__gnull#"), opt))
  }
}
