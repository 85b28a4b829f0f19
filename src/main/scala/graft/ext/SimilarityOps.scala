package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity operators for LLM-training-data pipelines.
  *
  * All shapes here are chosen for the 1000-executor case:
  *   - centroids / query sets are tiny → broadcast, never shuffled;
  *   - per-label top-k is two-phase (within (key, salt) buckets, then
  *     global) so no single reducer ever sees a whole key's rows;
  *   - the vector math is codegen-friendly higher-order functions
  *     (`zip_with` + `aggregate`), not UDFs.
  */
object SimilarityOps {

  /** Dot product of two double arrays — native codegen'd expression
    * ([[graft.functions.ArrayDotProduct]]): one primitive loop per pair,
    * same fold order as the HOF spelling it replaced (bit-identical
    * results), ~an order of magnitude less per-pair cost than interpreted
    * `aggregate(zip_with(...))` lambdas. */
  def dot(a: Column, b: Column): Column =
    graft.functions.HashFunctions.arrayDot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  private[ext] def toDoubleArray(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Symmetric per-vector int8 quantization: scale = max|v|/127,
    * q_i = clamp(⌊v_i/scale + 0.5⌋, ±127) — 4× less storage/IO than
    * float32 for ANN corpora (the difference between scanning 100 TB and
    * 25 TB), with reconstruction error ≤ scale/2 per dimension. All-zero
    * vectors quantize to zeros with scale 0. Arithmetic is exact-double
    * (float→double widening, IEEE division, FLOOR(x+0.5)) so the SAME
    * codes come out of any engine. Returns struct(scale, q: array<int>). */
  def quantizeInt8(embedding: Column): Column = {
    // Expression-level "let": HOF lambda bodies are interpreted with no
    // subexpression elimination, so referencing `scale` (itself an O(n)
    // array_max) directly inside the per-element lambda would re-reduce the
    // whole array per ELEMENT — O(n²) per row. Binding the double array and
    // then the scale as single-element-transform lambda variables evaluates
    // each exactly once; the inner lambda touches only O(1) variables.
    element_at(transform(array(toDoubleArray(embedding)), d =>
      element_at(transform(
        array(array_max(transform(d, x => abs(x))) / lit(127.0d)), scale =>
        struct(
          scale.as("scale"),
          when(scale === 0.0d, transform(d, _ => lit(0)))
            .otherwise(transform(d, x =>
              greatest(lit(-127), least(lit(127),
                floor(x / scale + 0.5d).cast("int"))))).as("q"))), 1)), 1)
  }

  /** Inverse of [[quantizeInt8]]: q_i·scale as array<double>. */
  def dequantizeInt8(quantized: Column): Column =
    transform(quantized.getField("q"),
      x => x.cast("double") * quantized.getField("scale"))

  /** Per-label mean vector. Uses MLlib `Summarizer.mean`, which partial-
    * aggregates (map-side combine) one vector per row through a single
    * shuffle — unlike a posexplode reshape, which would amplify the shuffle
    * by the embedding dimension (VERDICT r1 on q26). */
  def labelCentroids(emb: DataFrame, labelCol: String = "label",
      embeddingCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    emb
      .select(col(labelCol).as("c_label"),
        array_to_vector(toDoubleArray(col(embeddingCol))).as("v"))
      .groupBy(col("c_label"))
      .agg(Summarizer.mean(col("v")).as("mv"))
      .select(col("c_label"), vector_to_array(col("mv")).as("centroid"))
  }

  /** Top-k rows per label centroid by cosine. Centroids broadcast; salted
    * two-phase top-k. Output: (label, rk, vec_id, cosine·4dp). */
  def centroidTopK(emb: DataFrame, k: Int = 5, salts: Int = 32): DataFrame = {
    // Norms hoisted out of the pair loop (the q166/batchQuery discipline):
    // each side's sqrt(dot(v,v)) is computed once per ROW, and the pair
    // score divides by the SAME Multiply(√aa, √bb) — bit-identical to the
    // inline cosine at a third of the per-pair folds.
    val centroids = labelCentroids(emb)
      .withColumn("cn", l2Norm(col("centroid")))
    val base = emb
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("vec"))
      .withColumn("vn", l2Norm(col("vec")))
    val scored = base.crossJoin(broadcast(centroids))
      .withColumn("cos", dot(col("vec"), col("centroid"))
        / (col("vn") * col("cn")))
      .select(col("c_label"), col("vec_id"), col("cos"))

    // Phase 1: top-k within (label, salt); phase 2: top-k of survivors.
    val salted = scored.withColumn("salt", pmod(col("vec_id"), lit(salts)))
    val w1 = Window.partitionBy(col("c_label"), col("salt"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val w2 = Window.partitionBy(col("c_label"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    salted
      .withColumn("rk1", row_number().over(w1)).filter(col("rk1") <= k)
      .withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select(col("c_label").as("label"), col("rk"), col("vec_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("label"), col("rk"))
  }

  /** Brute-force cosine top-k neighbors for a (small, broadcast) query set —
    * the exact ANN baseline. One pass over the corpus per plan, all query
    * vectors scored against each row via the broadcast side; linear in
    * rows×queries, which is the intended cost of the *baseline*. Salted
    * two-phase top-k keeps reducers bounded. Output:
    * (query_id, rk, vec_id, cosine·4dp). */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      salts: Int = 32): DataFrame = {
    // Norms hoisted out of the pair loop (the q166/batchQuery discipline);
    // dot/(vn·qn) is the identical IEEE expression tree as inline cosine.
    val q = broadcast(queries.select(
        col("vec_id").as("query_id"),
        toDoubleArray(col("embedding")).as("qvec"))
      .withColumn("qn", l2Norm(col("qvec"))))
    val scored = corpus
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("vec"))
      .withColumn("vn", l2Norm(col("vec")))
      .join(q, col("vec_id") =!= col("query_id")) // skip self-match
      .withColumn("cos", dot(col("vec"), col("qvec"))
        / (col("vn") * col("qn")))
      .select(col("query_id"), col("vec_id"), col("cos"))
    val salted = scored.withColumn("salt", pmod(col("vec_id"), lit(salts)))
    val w1 = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    salted
      .withColumn("rk1", row_number().over(w1)).filter(col("rk1") <= k)
      .withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim) —
    * a hash-derived value in [-0.5, 0.5), stable across executors. */
  private def planeComponent(plane: Int, dimIdx: Column): Column =
    (pmod(xxhash64(lit(plane * 100000L) + dimIdx), lit(1000)).cast("double")
      / 1000.0d) - 0.5d

  /** Random-hyperplane LSH bucket signature: `planes` sign bits packed into
    * a long. Rows (and queries) hash to buckets; candidate generation joins
    * on the bucket key only — the scale path that avoids scoring the full
    * corpus per query. `planeOffset` selects an independent plane set
    * (multi-table LSH uses offsets 0, planes, 2·planes, …). */
  def lshBucket(embedding: Column, planes: Int, planeOffset: Int = 0): Column = {
    val dims = transform(embedding, (_, i) => i)
    val bits = (0 until planes).map { p =>
      val d = aggregate(
        zip_with(embedding, dims,
          (x, i) => x.cast("double") * planeComponent(planeOffset + p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(d >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Portable random-hyperplane LSH bucket — the oracle-checkable lane
    * beside [[lshBucket]]'s xxhash64 throughput lane (the q30
    * XOR-permutation precedent: keep the fast hash as the production
    * engine, expose an md5-derived spelling any SQL dialect reproduces
    * verbatim). Planes are ±1 sign vectors from [[projectionSigns]]
    * (Rademacher hyperplanes — the same Achlioptas construction
    * [[randomProject]] uses; sign-LSH needs only direction, so ±1
    * components are as valid as uniform ones), keyed by the GLOBAL plane
    * index `planeOffset + p` under seed `"lshp"`.
    *
    * The sign decision runs in EXACT integer arithmetic: each float
    * component widens to double (IEEE-exact) and quantizes to micro-units
    * `⌊x·1e6 + 0.5⌋` as a long, so the `Σ ±q_i ≥ 0` bit is independent of
    * summation order — no engine pair can disagree on a bucket, unlike a
    * float dot whose near-zero sign rides fold order. |Σ| ≤ dim·1e6·|x|max,
    * nowhere near 2^63 for unit-scale embeddings. The signs ship as ONE
    * literal matrix (planes·dim longs), broadcast with the plan — scan
    * speed, no shuffle, same shape as the throughput lane. */
  /** One-row dimension probe guarding the portable lanes: the static
    * sign-matrix literal is `inDim` wide, and a mismatched corpus would
    * degenerate silently (nulled dots → one giant bucket) instead of
    * failing. Cost: a single-row LIMIT job per call site. */
  private[ext] def requireDim(df: DataFrame, inDim: Int, who: String): Unit = {
    // Empty input (or an all-null probe row) is NOT a mismatch: the lanes
    // return an empty result lazily, same as the xxhash64 path.
    df.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).head(1).foreach { r =>
        val got = r.getInt(0)
        require(got == inDim,
          s"$who(portable = true): embeddings are $got-dimensional but the " +
            s"md5 plane matrix is built for inDim=$inDim — pass inDim=$got")
      }
  }

  def lshBucketPortable(embedding: Column, planes: Int, planeOffset: Int = 0,
      inDim: Int = 64, seed: String = "lshp"): Column = {
    val signs = projectionSigns(seed, planeOffset + planes, inDim)
    // Expression-level "let" (the quantizeInt8 trick): the quantized array
    // is referenced once per plane; bound as a lambda variable it is
    // computed once per row, not `planes` times.
    element_at(transform(array(
        transform(embedding,
          x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long"))), qv =>
      (0 until planes).map { p =>
        val row = array(signs(planeOffset + p).map(v => lit(v.toLong)): _*)
        val dp = aggregate(zip_with(qv, row, (x, sg) => x * sg),
          lit(0L), (acc, x) => acc + x)
        when(dp >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }.reduce(_ + _)), 1)
  }

  /** Deterministic k-means-lite centroids for IVF — PORTABLE arithmetic
    * (r12, replacing xxhash64 seeds + `Summarizer.mean`): seeds are the k
    * rows with the smallest `md5_60("kmseed_<id>")`, and every Lloyd
    * round runs on EXACT integers, so the SAME centroids come out of any
    * engine, any partitioning, any run — which is what lets the q41
    * DuckDB oracle unroll the whole training loop as CTEs:
    *
    *   - vectors quantize once to micro-units `⌊x·1e6 + 0.5⌋` (long);
    *   - assignment scores are integer-dot cosines
    *     (`qc/√(qq·cc)`, all three dots exact longs — cosine is
    *     scale-invariant, so micro-units need no un-scaling), rounded to
    *     4dp BEFORE an argmax that tie-breaks to the LOWEST cell (the
    *     repo's round-before-decision rule, same as
    *     IvfIndex.assignToCentroids);
    *   - the recomputed centroid is the RE-QUANTIZED micro-unit mean
    *     `⌊Σq/n + 0.5⌋` — per-dimension sums of integer-valued doubles
    *     are exact (< 2^53) in ANY summation order, so the float-
    *     partition-order sensitivity of the old `Summarizer.mean` path
    *     is gone, and re-quantizing keeps every later dot inside long
    *     range at any corpus size (components stay ≤ max|x|·1e6).
    *
    * Output: (cell, centroid array<double>), centroid_i = micro-mean/1e6
    * — the true mean to 1e-6, same schema as before. Each round is one
    * corpus pass against broadcast centroids. Exactness bounds: Spark's
    * long dots stay exact while max|x| ≤ ~47 (64·(4.7e7)² < 2^63), but
    * the CROSS-ENGINE contract is tighter — the DuckDB oracle evaluates
    * the same dots via list_dot_product over doubles, exact only while
    * |dot| < 2^53, i.e. max|x| ≤ ~11 at 64 dims (64·(1.1e7)² < 2^53).
    * Embeddings beyond unit-ish scale should be normalized first; the
    * fixture corpus is unit-scale, far inside both envelopes. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    val qvs = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long")).as("qv"))
    // cell ids 0..k-1 over the k seed rows via the bounded two-phase rank
    // (k rows, but keeps the no-unpartitioned-window discipline uniform)
    var centroids = ShardOps.withGlobalRank(
        qvs.orderBy(graft.functions.HashFunctions.md5Hash60(
          concat(lit("kmseed_"), col("vec_id"))), col("vec_id")).limit(k),
        Seq(col("vec_id")))
      .select((col("__rn") - 1).cast("int").as("cell"), col("qv").as("cq"))
    (1 to iters).foreach { _ =>
      centroids = assignCellsMicro(qvs, centroids)
        .select(col("cell"), transform(col("qv"), x => x.cast("double")).as("qd"))
        .groupBy(col("cell"))
        // zip_with-based elementwise array sum via aggregate over doubles
        // would re-fold per row; Summarizer.sum partial-aggregates one
        // vector per row through a single shuffle (the labelCentroids
        // shape) and is EXACT here: integer-valued doubles below 2^53.
        .agg(sumVec(col("qd")).as("sv"), count(lit(1)).as("n"))
        .select(col("cell"), transform(col("sv"),
          s => floor(s / col("n") + lit(0.5)).cast("long")).as("cq"))
    }
    centroids.select(col("cell"),
      transform(col("cq"), x => x.cast("double") / 1e6).as("centroid"))
  }

  /** Exact per-dimension vector sum (Summarizer.sum): map-side-combinable,
    * one shuffle, order-independent on integer-valued inputs. */
  private def sumVec(arr: Column): Column = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    vector_to_array(Summarizer.sum(array_to_vector(arr)))
  }

  /** Nearest-centroid assignment on micro-unit integers: exact long
    * dots, 4dp-rounded score, lowest-cell tie-break — no shuffle of the
    * corpus. The per-row argmax over broadcast centroids runs as a tight
    * `mapPartitions` loop rather than a crossJoin: the N×k row blowup
    * put the 64-long vector inside a `max_by` struct, whose non-fixed-
    * width buffer forces the aggregate off the fast hash path — at
    * 1.5M×1225 (the sf10 index build) that shape ran for 40+ minutes
    * where this loop takes seconds, and the loop is what a cluster
    * executor should run anyway (k·d multiply-adds per row, zero
    * allocation, no 1.9B-row exchange). Centroids collect to the driver
    * — k = O(√N) rows, the PqOps codebook discipline. Arithmetic is
    * bit-identical to the expression spelling it replaced: the same
    * ascending-index long folds, the same
    * `qc/√(qq·cc)` → `FLOOR(·1e4+0.5)/1e4` IEEE ops, and the same
    * strict `Double.compare` replacement over ascending cells (ties keep
    * the lowest cell, Spark's struct-ordering semantics incl. NaN). */
  private def assignCellsMicro(qvs: DataFrame,
      centroids: DataFrame): DataFrame = {
    val spark = qvs.sparkSession
    import spark.implicits._
    val cents: Array[(Int, Array[Long])] = centroids
      .select(col("cell"), col("cq")).as[(Int, Array[Long])]
      .collect().sortBy(_._1)
    val ccs: Array[Long] = cents.map { case (_, cq) =>
      var cc = 0L; var i = 0
      while (i < cq.length) { cc += cq(i) * cq(i); i += 1 }
      cc
    }
    val bc = spark.sparkContext.broadcast((cents, ccs))
    qvs.select(col("vec_id"), col("qv")).as[(Long, Array[Long])]
      .mapPartitions { it =>
        val (cs, cc) = bc.value
        it.map { case (id, qv) =>
          var qq = 0L
          var i = 0
          while (i < qv.length) { qq += qv(i) * qv(i); i += 1 }
          var bestCell = -1
          var bestCos = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val cq = cs(c)._2
            var qc = 0L
            val n = math.min(qv.length, cq.length)
            i = 0
            while (i < n) { qc += qv(i) * cq(i); i += 1 }
            val cos =
              if (qq == 0L || cc(c) == 0L) 0.0d
              else qc.toDouble / math.sqrt(qq.toDouble * cc(c).toDouble)
            // SQL FLOOR(double) yields LONG (NaN→0): mirror via .toLong
            val cos4 = math.floor(cos * 10000.0d + 0.5d).toLong / 10000.0d
            if (java.lang.Double.compare(cos4, bestCos) > 0) {
              bestCos = cos4; bestCell = cs(c)._1
            }
            c += 1
          }
          (id, bestCell, qv)
        }
      }.toDF("vec_id", "cell", "qv")
  }

  /** IVF approximate KNN: corpus rows indexed into `nCells` centroid
    * cells; each query probes its `nProbe` nearest cells and scores only
    * those rows — the classic inverted-file ANN layout. The cell index is
    * a corpus partition key: at scale, write the corpus bucketed by cell
    * and probing touches only matching buckets. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    // Norms hoisted out of every pair loop (q166/batchQuery discipline):
    // each row/centroid/query norm is computed once, and every score
    // divides by the same Multiply(√aa, √bb) — bit-identical results.
    val centroids = kmeansCentroids(corpus, nCells, iters)
      .withColumn("cn", l2Norm(col("centroid")))
    // Round-before-argmax + lowest-cell tie-break: the same assignment
    // rule as the training rounds and IvfIndex.assignToCentroids — one
    // decision rule everywhere.
    val indexed = corpus
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("vec"))
      .withColumn("vn", l2Norm(col("vec")))
      .crossJoin(broadcast(centroids))
      .withColumn("cos4",
        floor(dot(col("vec"), col("centroid")) / (col("vn") * col("cn"))
          * 10000 + lit(0.5)) / 10000)
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cell"), col("vec")),
        struct(col("cos4"), -col("cell"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        col("best.vec").as("vec"))
      .withColumn("vn", l2Norm(col("vec")))

    // Tiny per-query probe list: query × centroid (both broadcast-scale).
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cell"))
    val probes = queries
      .select(col("vec_id").as("query_id"), toDoubleArray(col("embedding")).as("qvec"))
      .withColumn("qn", l2Norm(col("qvec")))
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("qvec"), col("centroid"))
        / (col("qn") * col("cn")))
      .withColumn("pr", row_number().over(probeW)).filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qvec"), col("qn"), col("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    indexed.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("vec"), col("qvec"))
        / (col("vn") * col("qn")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** LSH-bucketed approximate KNN: bucket both sides on `planes` hyperplane
    * sign bits, score only same-bucket candidates, top-k per query.
    * Recall < 1 by construction; `tables` independent plane sets are
    * OR-combined (the textbook multi-table construction: candidates =
    * union over tables, so recall grows monotonically with `tables` at
    * `tables`× the bucketing/join cost, never the scoring cost of a wider
    * bucket). The companion test measures recall against [[bruteForceKnn]].
    *
    * `portable = true` swaps the xxhash64 planes for the md5-derived
    * [[lshBucketPortable]] set — identical pipeline shape, but every stage
    * (bucketing, candidate join, exact-cosine verify, top-k) becomes
    * SQL-expressible, so a foreign engine rebuilds the WHOLE result
    * hash-for-hash (the q38 DuckDB oracle). The portable plane matrix is
    * a static `inDim`-wide literal, so the corpus dimension is CHECKED
    * up front — a mismatched `zip_with` would null every dot and
    * silently collapse all rows into bucket 0 (the xxhash64 lane adapts
    * to any dimension and needs no check). */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      planes: Int = 8, tables: Int = 1,
      portable: Boolean = false, inDim: Int = 64): DataFrame = {
    require(tables >= 1)
    if (portable) {
      // BOTH sides ride the static inDim-wide sign matrix — a mismatched
      // query side would null its dots and send every query to bucket 0
      // just as silently as a mismatched corpus.
      requireDim(corpus, inDim, "lshKnn")
      requireDim(queries, inDim, "lshKnn")
    }
    def bucketFor(t: Int) =
      if (portable)
        lshBucketPortable(col("embedding"), planes, t * planes, inDim)
      else lshBucket(col("embedding"), planes, t * planes)
    def withBuckets(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col("vec_id").as(idAs),
        toDoubleArray(col("embedding")).as(vecAs),
        col("embedding"))
        // norm hoisted out of the candidate loop (q166/batchQuery
        // discipline) AND computed BEFORE the per-table explode (r12
        // ADVICE: after the posexplode it was re-folded once per
        // (row × table) — `tables`× more norm folds than needed); the
        // column carries through the explode unchanged, and dot/(·)
        // below is the identical IEEE tree either way.
        .withColumn(vecAs + "_n", l2Norm(col(vecAs)))
        // _outer: the table array is never empty (tables >= 1) and a
        // non-outer explode would get an inferred pre-filter duplicating
        // every per-table lshBucket expression twice more per row.
        .select(col(idAs), col(vecAs), col(vecAs + "_n"),
          posexplode_outer(array((0 until tables).map(bucketFor): _*))
            .as(Seq("tbl", "bucket")))
    val cb = withBuckets(corpus, "vec_id", "vec")
    val qb = broadcast(withBuckets(queries, "query_id", "qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cb.join(qb, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("vec"), col("qvec"))
        / (col("vec_n") * col("qvec_n")))
      // A pair colliding in several tables produces identical rows —
      // dedup before ranking.
      .select(col("query_id"), col("vec_id"), col("cos")).distinct()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): assign every embedding to its nearest centroid,
    * then compare pairs ONLY within a cell — a row is a duplicate iff some
    * lower-id row in the same cell has cosine ≥ `tau`. `dup_of` is the
    * smallest such id (the kept representative); dedup = `keep = 1`.
    *
    * Scale shape: centroids broadcast (assignment never shuffles the
    * corpus); the pair join is keyed on `cell`, so the quadratic is
    * bounded by cell size — corpus/k on average, never all-pairs. That
    * cell-bounding is the whole point of clustering before comparing:
    * at 100 TB the cell is also the layout bucket, so the self-join is
    * co-partitioned. Cosines are half-up rounded to 4dp BEFORE the
    * threshold so the keep/drop decision is engine-exact.
    *
    * `corpus` needs (`vec_id`, `embedding`); `centroids` (`cid`, `ce`)
    * with double-array `ce` (e.g. from [[kmeansCentroids]]). */
  def semDedup(corpus: DataFrame, centroids: DataFrame,
      tau: Double = 0.999): DataFrame = {
    val assigned = corpus
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("vec"))
      .crossJoin(broadcast(centroids))
      // Round the assignment score to 4dp BEFORE the argmax, mirroring the
      // rounding the pair threshold already applies: a near-tie between two
      // centroids must pick the same cell on every engine (the repo's
      // round-before-decision rule), not ride unrounded float noise.
      .withColumn("cos",
        floor(cosine(col("vec"), col("ce")) * 10000 + lit(0.5)) / 10000)
      .groupBy(col("vec_id"))
      // Ties (exact duplicate of a centroid row) break to the lowest cid
      // on both engines: order by (cos, -cid) descending.
      .agg(max_by(struct(col("cid"), col("vec")),
        struct(col("cos"), -col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cell"), col("best.vec").as("vec"))
      // Pre-normalize ONCE per row: the pair stage then needs only a dot
      // product — one HOF fold per pair instead of cosine's three (dot +
      // both norms), and norms are computed n times instead of n² times
      // (6.7 s → the pair stage's dominant cost at sf0.1). Decision
      // safety: the threshold compares the 4dp-rounded score, and real
      // pairs sit far from τ (exact dups ≈ 1.0, unrelated ≤ ~0.6), so the
      // normalized-dot float path decides identically to full cosine.
      // (norm materialized as a column — embedded in the lambda body it
      // would be re-folded per ELEMENT, interpreted lambdas have no CSE)
      .withColumn("nrm", sqrt(dot(col("vec"), col("vec"))))
      .withColumn("vn", transform(col("vec"),
        x => when(col("nrm") > 0, x / col("nrm")).otherwise(lit(0.0d))))
      .drop("nrm")
      // The self-join + final left join reference `assigned` three times;
      // without a materialization Spark re-derives the scan→assign subtree
      // for each reference (three corpus passes + three argmax shuffles).
      // localCheckpoint pins it to ONE pass. In a persisted deployment the
      // equivalent is writing the assignment bucketed by `cell`
      // (Layout.writeBucketed), which also co-partitions the pair join.
      .localCheckpoint()
    val a = assigned.select(col("cell"), col("vec_id").as("id1"), col("vn").as("v1"))
    val b = assigned.select(col("cell"), col("vec_id").as("id2"), col("vn").as("v2"))
    val dups = a.join(b, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .filter(floor(dot(col("v1"), col("v2")) * 10000 + lit(0.5)) / 10000 >= tau)
      .groupBy(col("id2")).agg(min(col("id1")).as("dup_of"))
    assigned.join(dups, assigned("vec_id") === dups("id2"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("dup_of").isNull, 1).otherwise(0).cast("int").as("keep"),
        col("dup_of"))
      .orderBy(col("vec_id"))
  }

  /** The ±1 sign matrix behind [[randomProject]]: `sign(j, i)` is +1 iff
    * the first hex nibble of `md5("<seed>_<j>_<i>")` is < '8' — a
    * deterministic, engine-independent derivation any SQL dialect with
    * `md5()` reproduces verbatim (DuckDB does, in the q100 oracle). */
  private[ext] def projectionSigns(seed: String, outDim: Int,
      inDim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (j, i) =>
      md.reset()
      val h = md.digest(s"${seed}_${j}_${i}".getBytes("UTF-8"))
      // first hex char < '8'  ⇔  top nibble of byte 0 is 0–7
      if (((h(0) >> 4) & 0xf) < 8) 1.0d else -1.0d
    }
  }

  /** Johnson–Lindenstrauss dimensionality reduction: project each
    * embedding onto `outDim` random ±1 directions (Achlioptas 2003 —
    * sign matrices preserve pairwise distances like Gaussians do, with
    * integer-friendly arithmetic). 64→8 dims cuts ANN scan IO 8× while
    * approximately preserving cosine geometry; compose with
    * [[quantizeInt8]] for another 4×.
    *
    * The matrix is not stored anywhere — it is a pure function of
    * (seed, dims) via md5 ([[projectionSigns]]), so any engine, any run,
    * and any later append derives bit-identical projections. Scale shape:
    * the signs ship as ONE broadcast literal (outDim·inDim doubles); the
    * projection is a per-row whole-stage-codegen fold over the embedding
    * — no shuffle, no join, scan speed. Output: `idCol` +
    * `proj` array<double>, each coordinate 4dp-rounded (the repo's
    * round-before-compare rule). */
  def randomProject(emb: DataFrame, outDim: Int, inDim: Int,
      seed: String = "rp", idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(outDim >= 1 && inDim >= 1)
    val signs = projectionSigns(seed, outDim, inDim)
    val vec = toDoubleArray(col(embCol))
    val proj = array((0 until outDim).map { j =>
      val row = array(signs(j).map(lit): _*)
      val s = aggregate(zip_with(vec, row, (x, sg) => x * sg),
        lit(0.0d), (acc, x) => acc + x)
      floor(s * 10000 + lit(0.5)) / 10000
    }: _*)
    emb.select(col(idCol), proj.as("proj"))
  }
}
