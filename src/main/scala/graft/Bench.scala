package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds + total.
  *
  * Measurement discipline (VERDICT r1 #10, r3 #3):
  *   - full materialization via a `noop` write — every result column is
  *     computed and serialized, unlike `count()` which lets Catalyst prune
  *     unevaluated projections;
  *   - one warmup run per query (JIT, file-listing, broadcast caches), then
  *     TWO suite passes with two timed runs each; per-query time is the MIN
  *     of the four timed runs. A shared-box contention burst inflates runs
  *     that happen during it; the min across passes separated by several
  *     minutes is robust to a single burst (r3's q34 13.4 s median re-ran
  *     at 1.0 s — the harness, not the query, was the outlier).
  *   - the driver captures a bounded stdout tail (2000 chars, measured from
  *     BENCH_r06.json): r6's full-name 76-query line was 2026 bytes and the
  *     head of the line fell outside the window → `parsed: null`. r7 switched
  *     the stdout line to short `qNN[b]` keys, which held to ~170 queries;
  *     the 200-query r10 line (~2.4 KB) outgrew even that and the driver
  *     recorded `parsed: null` again (VERDICT r10 #2). 200 timings cannot fit
  *     a 2000-char JSON line at any honest precision, so stdout now ends with
  *     a SMALL summary line (`metric=total`, totals + failed + counts +
  *     the q01 box-drift canary, ~330 chars — always complete inside the
  *     tail window), preceded by `metric=queries_chunk` lines of ≤1500
  *     chars each carrying the short-key per-query map in ASCENDING-time
  *     order, so the visible last chunk holds the expensive queries (the
  *     regex recovery in tools/compare_bench.py reads entries straight off
  *     it). The full-name full-precision single-line artifact is written to
  *     `bench_out_c<cpus>.json` (cpus-suffixed so the driver's low-core
  *     scaling run cannot clobber the 32-core record — r12 VERDICT #1) and
  *     mirrored to `bench_out.json` as the last-run convenience copy.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session config lives in graft.Sessions — ONE builder shared with
    // Verify, so measured config == verified config (r12 VERDICT #7);
    // this file is timing logic only.
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Dev-loop filter: SPARK_GRAFT_ONLY="q61,q40" times just those queries.
    // Unset (the driver's invocation) → full suite, behavior unchanged.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(f => f.exists(n.startsWith)) }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // SPARK_GRAFT_VERBOSE=1: per-query progress + failure lines on stderr
    // (diagnosing a long/failed run without re-running it query-by-query;
    // stderr so the stdout JSON protocol is untouched).
    val verbose = sys.env.get("SPARK_GRAFT_VERBOSE").contains("1")
    // SPARK_GRAFT_PASSES (default 2): the driver's invocation keeps the
    // full 1-warmup + 2×2-run discipline; heavy cross-scale sweeps (the
    // sf1-derived subset, where single queries run minutes) set 1 pass —
    // still a MIN of two timed runs, documented as lighter in the
    // artifact that records them.
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(2)
    for (pass <- 1 to passes; (name, fn) <- names) {
      try {
        if (verbose) System.err.println(s"[bench] pass $pass start $name")
        if (pass == 1) once(fn) // warmup
        samples(name) = once(fn) :: once(fn) :: samples(name)
        if (verbose) System.err.println(
          s"[bench] pass $pass done  $name ${samples(name).take(2).map(fmt).mkString(",")}")
      } catch { case e: Throwable =>
        if (verbose) System.err.println(
          s"[bench] pass $pass FAIL  $name: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).takeWhile(_ != '\n').take(200))
      }
    }
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val results = names.map { case (k, _) =>
      k -> (if (samples(k).isEmpty) -1.0 else samples(k).min)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    // Median-based companion total (lower-median of the 4 samples): min is
    // robust to contention bursts but best-case-biased; publishing both
    // keeps cross-round deltas honest without changing the primary metric.
    val totalMedian = names.map { case (k, _) =>
      val s = samples(k).sorted
      if (s.isEmpty) 0.0 else s((s.length - 1) / 2)
    }.sum
    // A query that errored every run records -1 AND lands in an explicit
    // `failed` list — a multi-query wipeout must not hide inside a
    // plausible-looking total (VERDICT r8 #5).
    val failed = results.collect { case (k, v) if v < 0 => k }
    def jsonLine(key: String => String): String = {
      val qs = results.map { case (k, v) => "\"" + key(k) + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val fl = failed.map(k => "\"" + key(k) + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_median":${fmt(totalMedian)},"failed":$fl,"queries":$qs,"sf":"$sfDir"}"""
    }
    // The full-precision artifact is written to a ${cpus}-SUFFIXED file so
    // the driver's low-core scaling run cannot clobber the 32-core record
    // (r12 VERDICT #1a: the committed bench_out.json held the c8 data);
    // the unsuffixed name is kept as a convenience copy of the LAST run.
    val outFile = s"bench_out_c$cpus.json"
    for (f <- Seq(outFile, "bench_out.json")) {
      try {
        val w = new java.io.PrintWriter(f)
        try w.println(jsonLine(identity)) finally w.close()
      } catch { case _: Throwable => () }
    }
    // stdout protocol (VERDICT r10 #2): per-query timings as chunked
    // short-key JSON lines (each a complete object, ≤1500 chars), then the
    // summary as the FINAL line — small enough that the driver's 2000-char
    // tail always contains it whole, regardless of inventory growth.
    // Chunk entries are ordered by ASCENDING time (r12 VERDICT #1b): the
    // driver captures a bounded stdout TAIL, so the LAST chunk — the only
    // one guaranteed visible — must carry the HOT set; cheap floor-bound
    // queries go first, the most expensive timings land immediately before
    // the summary line. (Full map: the queries_file artifact.)
    val entries = results.sortBy(_._2).map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v)
    }
    val chunks = scala.collection.mutable.ListBuffer.empty[List[String]]
    var cur = List.empty[String]
    var curLen = 0
    for (e <- entries) {
      if (curLen + e.length + 1 > 1400 && cur.nonEmpty) {
        chunks += cur.reverse; cur = Nil; curLen = 0
      }
      cur = e :: cur; curLen += e.length + 1
    }
    if (cur.nonEmpty) chunks += cur.reverse
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(s"""{"metric":"queries_chunk","chunk":${i + 1},"of":${chunks.size},"queries":${c.mkString("{", ",", "}")}}""")
    }
    val fl = failed.map(k => "\"" + k.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    // Box-drift canary (r12 VERDICT #1c): q01's count-star is a fixed
    // trivial probe whose time tracks the machine, not the code — r12
    // burned its judging signal proving a 0.66× "regression" was the box
    // running 1.5× slower between sessions. Publishing it as a
    // first-class summary field makes cross-round drift self-evident:
    // normalize totals by the canary before attributing deltas to code.
    val canary = results.toMap.getOrElse("q01_count_star", -1.0)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_median":${fmt(totalMedian)},"canary_q01":${fmt(canary)},"failed":$fl,"n_queries":${results.size},"chunks":${chunks.size},"queries_file":"$outFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
