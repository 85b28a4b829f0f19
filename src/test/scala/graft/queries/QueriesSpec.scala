package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Inventory-level checks for queries without a DuckDB oracle. */
class QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    Queries.all.find(_.name == name).get.fn(spark, sf)

  test("q17b approx distinct within 5% of exact q17") {
    val exact = run("q17_count_distinct").head()
    val approx = run("q17b_approx_distinct").head()
    Seq(0, 1).foreach { i =>
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - e) / e < 0.05, s"col $i: approx $a vs exact $e")
    }
  }

  test("q73b approx profile distincts within 5% of exact q73; no expand") {
    val exact = run("q73_dq_profile").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approxDf = run("q73b_dq_profile_approx")
    approxDf.collect().foreach { r =>
      val (c, a, e) = (r.getString(0), r.getLong(3).toDouble,
        exact(r.getString(0)).toDouble)
      // 5% relative, floor of ±1 absolute (HLL at cardinality ~20 is off
      // by at most a count or two).
      assert(math.abs(a - e) <= math.max(1.0, 0.05 * e),
        s"$c: approx $a vs exact $e")
    }
    // The sketch path must not plan the multi-DISTINCT Expand rewrite.
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("q47b log-hist percentiles within the α=0.5% contract of the exact " +
      "rank-select quantile per group") {
    import org.apache.spark.sql.functions._
    // Nearest-rank exact (the log-hist contract's reference point —
    // q47's QUANTILE_CONT interpolates BETWEEN order stats, so its gaps
    // would add data-dependent noise on top of the α envelope).
    val vals = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderstatus"), col("o_totalprice"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val approx = run("q47b_approx_percentiles").collect()
      .map(r => r.getString(0) -> Seq(0.5 -> r.getDouble(1),
        0.9 -> r.getDouble(2))).toMap
    assert(approx.keySet == vals.keySet)
    approx.foreach { case (g, qs) =>
      val vs = vals(g)
      qs.foreach { case (rank, a) =>
        val exact = vs(math.max(0, math.ceil(rank * vs.length).toInt - 1))
        // α relative error + one cent of round2: far tighter than the
        // old GK 2% envelope (q47b rides log_hist_agg since r11).
        assert(math.abs(a - exact) <= 0.005 * exact + 0.02,
          s"$g p$rank: $a vs $exact")
      }
    }
  }

  test("q159 merged estimate within 5% of exact; daily-partial merge " +
      "equals the one-pass sketch (KMV declared lane + native HLL lane)") {
    import org.apache.spark.sql.functions._
    val est = run("q159_hll_incremental").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Queries.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, e) =>
      assert(math.abs(est(t).toDouble - e) <= math.max(1.0, 0.05 * e),
        s"$t: union estimate ${est(t)} vs exact $e")
    }
    // Mergeability (declared KMV lane): the daily-partial merge must
    // equal the one-pass bottom-k sample over the raw rows — same
    // sketch state either way.
    import graft.functions.HashFunctions.{kmvDistinct, md5Hash60}
    val onePass = Queries.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(kmvDistinct(md5Hash60(col("user_id"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == onePass)
    // Library HLL lane (pre-serialized sketch stores): daily partials
    // unioned equal the single-pass DataSketches sketch exactly.
    val hllDaily = Queries.events(spark, sf)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hllOne = Queries.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hllDaily == hllOne)
  }

  test("q161 quantile estimates land within 0.5% RELATIVE error of the " +
      "exact quantile per type") {
    import org.apache.spark.sql.functions._
    val est = run("q161_quantile_sketch").collect()
      .map(r => r.getString(0) -> Seq(0.5 -> r.getDouble(2),
        0.9 -> r.getDouble(3), 0.99 -> r.getDouble(4))).toMap
    val ev = Queries.events(spark, sf)
      .select(col("event_type"), col("value").cast("double").as("v"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(est.keySet == ev.keySet)
    est.foreach { case (t, qs) =>
      val vs = ev(t)
      qs.foreach { case (rank, q) =>
        // the log-hist contract (α = 0.005): the estimate is the
        // midpoint of the bucket CONTAINING the rank-⌈q·n⌉ item, so it
        // sits within α relative error of that exact quantile value —
        // a far tighter pin than the old KLL 5% rank envelope
        val exact = vs(math.max(0,
          math.ceil(rank * vs.length).toInt - 1))
        // +1e-6 slack: estimates are round6-ed since r11 (the oracle
        // hash-match needs IEEE-identical outputs), which can add up to
        // 5e-7 on top of an exactly-at-the-α-bound midpoint.
        assert(math.abs(q - exact) <= 0.005 * math.abs(exact) + 1e-6,
          s"$t p$rank: est $q vs exact $exact")
      }
    }
  }

  test("q162 theta Jaccard estimates track the exact shingle overlap") {
    import org.apache.spark.sql.functions._
    val est = run("q162_theta_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    // exact shingle sets per source, computed independently
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sets = docs
      .select(col("source"), graft.ext.DedupOps.wordTokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("source"), explode(graft.ext.DedupOps.shingles(col("w"), 2)).as("g"))
      .distinct().collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(est.nonEmpty)
    est.foreach { case ((a, b), jacEst) =>
      val exact = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      assert(math.abs(jacEst - exact) <= 0.05,
        s"($a,$b): est $jacEst vs exact $exact")
    }
  }

  test("q163 bloom prune: the might_contain prefilter is in the plan " +
      "and pruning loses no rows") {
    val df = run("q163_bloom_prune")
    assert(df.queryExecution.executedPlan.toString
      .contains("might_contain"))
    // exact reference without the bloom stage: plain semi join
    import org.apache.spark.sql.functions._
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val plain = spark.read.parquet(s"$sf/orders.parquet")
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == plain)
  }

  test("q172 BPE coverage: merges only shrink; two runs bit-identical") {
    val a = run("q172_bpe_coverage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    a.foreach { case (src, _, words, tokens, comp) =>
      assert(tokens <= words, s"$src: merged $tokens > words $words")
      assert(comp <= 1000000L, s"$src: compression $comp")
    }
    val b = run("q172_bpe_coverage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(a.toSeq == b.toSeq)
  }

  test("q173 funnel: stages monotone; totals agree with the raw ops") {
    import org.apache.spark.sql.functions._
    val rows = run("q173_curation_funnel").collect()
    rows.foreach { r =>
      val (raw, len, ex, near) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw >= len && len >= ex && ex >= near && near >= 0,
        s"${r.getString(0)}: $raw/$len/$ex/$near not monotone")
    }
    // total raw count matches the table; per-source sums match a direct
    // length-floor recount
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val lenDirect = docs.filter(
      size(graft.ext.DedupOps.wordTokens(col("text"))) >= 5).count()
    assert(rows.map(_.getLong(2)).sum == lenDirect)
  }

  test("every declared query runs and matches its declared column set") {
    Queries.all.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, q.name)
      assert(df.limit(1).collect() != null, q.name)
    }
  }

  test("q38 LSH output is a plan without a cartesian product") {
    val plan = run("q38_ann_lsh").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("q105/q110/q111 pair generation never plans a nested loop") {
    Seq("q105_fuzzy_join_ed1", "q110_interval_join",
        "q111_sorted_neighborhood").foreach { q =>
      val plan = run(q).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }

  test("q119/q123 graph queries: wedges and peels are hash joins, never nested loops") {
    Seq("q119_triangles", "q123_kcore").foreach { q =>
      val plan = run(q).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }

  test("q104 BM25: broadcast query/stat sides; the only nested loops are " +
      "the 1-row scalar-stat crosses") {
    val df = run("q104_bm25_topk")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // The N/Σdl scalar aggregates ride 1-row IdentityBroadcast crosses —
    // the scalar-subquery shape, bounded at two:
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 2, s"$bnlj nested loops:\n$plan")
  }

  test("q112 model filter: the scoring pass is exchange-free") {
    // The plan's only Exchange is the final presentation ORDER BY — the
    // MapPartitions scoring itself never shuffles.
    val plan = run("q112_model_filter").queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange".r.findAllIn(plan).length <= 1, plan)
    assert(plan.contains("MapPartitions"), plan)
  }

  test("q113 gopher rules: one pure projection — the only exchange is the presentation ORDER BY") {
    val plan = run("q113_gopher_rules").queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange".r.findAllIn(plan).length <= 1, plan)
    assert(!plan.contains("HashAggregate"), plan) // no aggregate at all
  }

  test("q114 heavy hitters: the exact recount is broadcast-pruned, never a sort-merge join") {
    val plan = run("q114_heavy_hitters").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan) // candidate semi-join
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("q116 dsir weights: the ratio table broadcasts; no vocab-keyed sort-merge join") {
    val plan = run("q116_dsir_weights").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("q115 ccnet buckets: no one-reducer-per-language window over the corpus") {
    // the only Window in the plan is the two-phase construction's
    // carry-in offsets frame, which is partition-count-sized, and the
    // lang-count join rides a broadcast.
    val df = run("q115_ccnet_buckets")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("filters reach the scan and projections prune the read schema") {
    // q02: the equality+range conjunction must be PushedFilters at the
    // parquet scan, not a post-scan Filter only.
    val p2 = run("q02_filter_conjunction").queryExecution.executedPlan.toString
    assert(p2.contains("PushedFilters: ["), p2.linesIterator.take(5).mkString("\n"))
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p2).isDefined,
      "expected at least one pushed filter on the events scan")
    // q03: a 3-column projection over 16-column lineitem must prune the
    // ReadSchema to the referenced columns (plus none extra).
    val p3 = run("q03_projection_expr").queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p3).map(_.group(1)).getOrElse("")
    val readCols = readSchema.split(",").map(_.takeWhile(_ != ':').trim).toSet
    assert(readCols.nonEmpty && readCols.size <= 4,
      s"q03 should read a handful of lineitem columns, got: $readCols")
    assert(!readCols.contains("l_comment"), "untouched column was read")
  }

  test("q47 exact percentiles run without a percentile aggregation buffer") {
    val plan = run("q47_percentiles").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"))
  }

  test("no declared query plans a CartesianProduct or an unbounded " +
      "unpartitioned window (structural PlanAudit sweep)") {
    // Broadcast cross joins (BroadcastNestedLoopJoin over a tiny side —
    // centroids, scalar aggregates, query sets) are deliberate; an
    // unpartitioned CartesianProduct anywhere is always a scale bug, and
    // so is a no-PARTITION-BY window whose input isn't limit-bounded.
    // The sweep needs AQE off: AdaptiveSparkPlanExec has no children, so
    // a tree walk over an AQE-wrapped plan silently scans NOTHING (the
    // r10 lesson — the old string-contains check couldn't see window
    // partition specs at all).
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val flagged = graft.PlanAudit.sweep(spark, sf)
      assert(flagged.isEmpty, flagged.mkString("\n"))
      // Second pass with auto-broadcast OFF — the at-scale join-strategy
      // view: every tiny-side cross/non-equi join must carry an explicit
      // broadcast() hint (hints survive any threshold), or it degrades
      // to a CartesianProduct on a cluster whose threshold differs
      // (r10-late caught eight such queries).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val flaggedNoBc = graft.PlanAudit.sweep(spark, sf)
      assert(flaggedNoBc.isEmpty,
        "with auto-broadcast disabled:\n" + flaggedNoBc.mkString("\n"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }
  }

  test("q64 vocab top-k plans as TakeOrderedAndProject, never a full sort") {
    val plan = run("q64_vocab_topk").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("generates over computed arrays carry no inferred pre-filter") {
    // InferFiltersFromGenerate would inline the whole generator expression
    // into a `size(e) > 0 AND isnotnull(e)` filter BELOW the Generate —
    // for the shingle/chunk pipelines that re-splits the document per gram
    // (q66 first measured 8.3 s at sf0.1). *_outer generates dodge the
    // rule; this pins the optimized plans filter-free under each Generate.
    Seq("q66_contamination", "q57_chunking", "q30_minhash_neardup").foreach {
      name =>
        val plan = run(name).queryExecution.optimizedPlan
        import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}
        plan.foreach {
          case g: Generate =>
            g.child.foreach {
              case f: Filter =>
                assert(!f.condition.toString.contains("lambdafunction"),
                  s"$name: inferred filter re-evaluates a generator lambda")
              case _ =>
            }
          case _ =>
        }
    }
  }

  test("q40's salted as-of equals the unsalted path, incl. a 90%-hot user") {
    import org.apache.spark.sql.functions._
    val ev = Queries.events(spark, sf)
      // pile ~90% of events onto one hot user to force the skew the salted
      // path exists for, keeping (user_id, ts) collision-free via event_id
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(10)) < 9, lit(7L)).otherwise(col("user_id")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pval"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "pval").orderBy("event_id").collect().toSeq
    val salted = graft.operators.AsOfJoin.backwardSalted(
      ev, purchases, Seq("user_id"), "ts", "ts", Seq("pval"), _.cast("date"))
    val plain = graft.operators.AsOfJoin.backward(
      ev, purchases, Seq("user_id"), "ts", "ts", Seq("pval"))
    assert(rows(salted) == rows(plain))
  }
}
