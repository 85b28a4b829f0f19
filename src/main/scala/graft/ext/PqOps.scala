package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest-neighbor search —
  * Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search" (IEEE TPAMI 2011).
  *
  * The embedding space is split into `m` contiguous subspaces; each
  * subspace gets its own k-code codebook (per-subspace Lloyd rounds), and
  * a vector is stored as `m` small code ids — 64 float32 dims compress to
  * 8 bytes (32×), which at 100 TB is the difference between an ANN scan
  * touching 3 TB of codes and touching the full corpus. Queries score
  * compressed rows with an asymmetric distance computation (ADC): one
  * `m×k` lookup table of exact query-to-centroid sub-distances per query,
  * then each corpus row costs `m` table lookups — no decompression.
  *
  * Scale/determinism shape, consistent with the repo's ANN family
  * ([[SimilarityOps.bruteForceKnn]], [[IvfIndex]]):
  *  - codebooks train on a (bounded, sampled) DataFrame and are tiny
  *    (`m·k·subDim` doubles) — they travel as broadcast literals;
  *  - [[encode]] is a pure per-row projection (no shuffle, no join): the
  *    compressed corpus streams out at scan speed;
  *  - [[searchAdc]] broadcasts the query side (LUTs included) and reuses
  *    the salted two-phase top-k, so no reducer holds a corpus slice;
  *  - nothing draws randomness, and (r12) ALL decision arithmetic is
  *    exact-integer on the micro-unit grid (`⌊x·1e6+0.5⌋` longs): init is
  *    md5-ordered, distances/LUTs/ADC sums are exact longs, argmins break
  *    ties toward the LOWEST code, and Lloyd means re-quantize via exact
  *    sums — codes and ranks are reproducible across runs, engines, and
  *    partitionings, which is what lets the q101 DuckDB oracle unroll
  *    train→encode→search end to end.
  */
object PqOps {

  /** Micro-unit quantization of a double-array column: `⌊x·1e6 + 0.5⌋`
    * as long — the r12 portable-arithmetic grid (the kmeansCentroids
    * discipline). All PQ distances then run on EXACT integers, so codes,
    * LUTs, and ADC ranks are engine-independent and the q101 DuckDB
    * oracle can rebuild the whole train→encode→search pipeline. */
  private def microQ(vec: Column): Column =
    transform(vec, x => floor(x * 1e6 + lit(0.5)).cast("long"))

  /** Exact integer squared L2 between two micro-unit long arrays. */
  private def l2sqInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, x) => acc + x)

  /** The whole codebook as ONE nested literal (m × k × subDim micro-unit
    * longs), via `typedlit` — a single Literal node, so the per-row work
    * is HOF loops over a constant, NOT a per-(sub, code) expression
    * forest (a 32×32 codebook spelled as 1024 separate aggregate
    * expressions costs tens of seconds of analysis + codegen before the
    * first row moves, and even an `array(array(array(lit…)))` spelling
    * re-folds a ~2k-node tree per plan; both measured on q101). */
  private def cbLiteral(cents: Array[Array[Array[Long]]]): Column =
    typedlit(cents.map(_.map(_.toSeq).toSeq).toSeq)

  /** The m contiguous sub-vectors of an embedding as one array column:
    * element s = dims [s·subDim, (s+1)·subDim). `dim` must be divisible
    * by `m`. */
  private def subVectors(vec: Column, m: Int, subDim: Int): Column =
    array((0 until m).map(s => slice(vec, s * subDim + 1, subDim)): _*)

  /** Train per-subspace codebooks with `iters` Lloyd rounds over a
    * (sampled) training set. PQ codebooks are classically trained on a
    * bounded sample (~100k–1M vectors) regardless of corpus size — pass
    * that sample here; [[encode]] then compresses the full corpus with no
    * further training cost.
    *
    * Init: the k rows with the smallest `(md5_60("pqseed_<id>"), vec_id)`
    * seed code c of EVERY subspace with their c-th sub-vector (the
    * [[SimilarityOps.kmeansCentroids]] r12 portable convention, per
    * subspace). Each round: nearest-code assignment against the literal
    * codebook (EXACT integer micro-unit distances, lowest-code ties),
    * then per-(sub, code) RE-QUANTIZED micro means `⌊Σq/n + 0.5⌋` — the
    * per-dimension sums are integer-valued doubles below 2^53, exact in
    * any summation order, so training is bit-identical across engines,
    * runs, and partitionings; a code that captures no vectors keeps its
    * previous centroid, so codebooks stay DENSE (exactly `m·k` rows —
    * [[encode]]/[[searchAdc]] index by code position).
    *
    * Returns (sub, code, centroid: array<double>), centroid_i =
    * micro-mean/1e6. */
  def trainCodebooks(sample: DataFrame, m: Int, k: Int,
      iters: Int = 2): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    require(m >= 1 && k >= 1 && iters >= 0)
    val sp = sample.sparkSession
    import sp.implicits._
    val dim = sample.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m")
    val subDim = dim / m
    // One materialization; each Lloyd round re-reads THIS, not the source.
    val vecs = sample.select(col("vec_id"),
        microQ(SimilarityOps.toDoubleArray(col("embedding"))).as("vec"))
      .localCheckpoint()
    val seeds = vecs.orderBy(graft.functions.HashFunctions.md5Hash60(
        concat(lit("pqseed_"), col("vec_id"))), col("vec_id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(seeds.length == k,
      s"PQ training sample has ${seeds.length} rows < k=$k")
    // Codebooks live on the DRIVER between rounds (m·k·subDim longs —
    // tiny by construction). Each round is then ONE Spark job with ONE
    // shuffle: assignment is a pure projection against the literal
    // codebook (the same expression encode uses — no broadcast join, no
    // per-(vec, sub) argmin shuffle; restructuring from the
    // join+groupBy spelling cut q101's training from ~12 s to ~2 s), and
    // the per-(sub, code) sums partial-aggregate through Summarizer.
    val cents: Array[Array[Array[Long]]] =
      Array.tabulate(m, k)((s, c) => seeds(c).slice(s * subDim, (s + 1) * subDim))
    (1 to iters).foreach { _ =>
      val pairs = zip_with(nearestCodesMicro(col("vec"), m, subDim, cents),
        subVectors(col("vec"), m, subDim),
        (c, v) => struct(c.as("code"), v.as("svec")))
      val sums = vecs.select(posexplode(pairs).as(Seq("sub", "p")))
        .select(col("sub"), col("p.code").as("code"),
          array_to_vector(transform(col("p.svec"),
            x => x.cast("double"))).as("v"))
        .groupBy(col("sub"), col("code"))
        .agg(Summarizer.sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .select(col("sub"), col("code"), vector_to_array(col("sv")).as("sv"),
          col("n"))
        .collect()
      // Empty codes keep their previous centroid — codebooks stay dense.
      // Mean re-quantization happens here on the driver with the same
      // double-division-then-floor every engine reproduces.
      sums.foreach { r =>
        val n = r.getLong(3)
        cents(r.getInt(0))(r.getInt(1)) =
          r.getSeq[Double](2).map(s => math.floor(s / n + 0.5).toLong).toArray
      }
    }
    (0 until m).flatMap(s => (0 until k).map(c =>
        (s, c, cents(s)(c).map(_.toDouble / 1e6).toSeq)))
      .toDF("sub", "code", "centroid")
  }

  /** The `m×k` ADC lookup table for one query-side vector: EXACT integer
    * squared sub-distances (micro² units) to every code of every
    * subspace — shared by [[searchAdc]] and [[IvfPq.query]] (there over
    * the RESIDUAL vector). The query quantizes to the same micro grid as
    * training, so LUT entries are longs any engine reproduces. */
  private[ext] def lutExpr(vec: Column, m: Int, subDim: Int,
      cents: Array[Array[Array[Long]]]): Column =
    zip_with(subVectors(microQ(vec), m, subDim), cbLiteral(cents),
      (sv, cbs) => transform(cbs, c => l2sqInt(sv, c)))

  /** ADC score for one encoded row against a query's LUT: `m` lookups,
    * summed as exact longs (micro² units — ≤ m·subDim·(2·max|x|·1e6)²,
    * comfortably inside long range for unit-scale embeddings). */
  private[ext] def adcScore(lut: Column, codes: Column): Column =
    aggregate(zip_with(lut, codes, (l, c) => element_at(l, c + 1)),
      lit(0L), (acc, x) => acc + x)

  /** Micro² ADC score → real-unit squared distance, 4dp half-up:
    * `⌊d/1e12·1e4 + 0.5⌋/1e4` — the output projection of [[searchAdc]]
    * and [[IvfPq.query]]. */
  private[ext] def adcToReal(adist: Column): Column =
    floor(adist.cast("double") / 1e8 + lit(0.5)) / 10000

  /** Nearest-code ids (array<int>, one per subspace) for a MICRO-UNIT
    * long-array vector against the literal codebook — shared by
    * [[trainCodebooks]]'s assignment step and [[encode]]. Distances are
    * exact integers (no rounding gate needed), first (= lowest) code on
    * ties via `array_position` of the min; the distance array is bound
    * through the single-element-transform "let" so it is computed once,
    * not once per reference (the quantizeInt8 lesson). */
  private def nearestCodesMicro(qvec: Column, m: Int, subDim: Int,
      cents: Array[Array[Array[Long]]]): Column =
    zip_with(subVectors(qvec, m, subDim), cbLiteral(cents),
      (sv, cbs) => {
        val dists = transform(cbs, c => l2sqInt(sv, c))
        element_at(transform(array(dists), dd =>
          (array_position(dd, array_min(dd)) - 1).cast("int")), 1)
      })

  /** Driver-side dense codebook image in micro units:
    * `(m, subDim, cents(sub)(code))`. The stored doubles are exactly
    * `micro/1e6`, so `round(c·1e6)` recovers the longs losslessly. Tiny
    * by construction (`m·k·subDim` longs). */
  private[ext] def collectCodebooks(codebooks: DataFrame)
      : (Int, Int, Array[Array[Array[Long]]]) = {
    val rows = codebooks.select(col("sub"), col("code"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).map(c => math.round(c * 1e6)).toArray))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    require(rows.length == m * k, s"codebooks not dense: ${rows.length} rows" +
      s" for m=$m k=$k")
    val cents = Array.ofDim[Array[Long]](m, k)
    rows.foreach { case (s, c, v) => cents(s)(c) = v }
    (m, cents(0)(0).length, cents)
  }

  /** Compress every embedding to its `m` code ids — a pure projection
    * over the constant-folded codebook literal: no shuffle, no join, scan
    * speed at any corpus size. Per sub-vector: exact integer micro-unit
    * distances to the sub's codes, first (= lowest) code on ties.
    * Output: (`idCol`, codes: array<int>). */
  def encode(emb: DataFrame, codebooks: DataFrame,
      idCols: Seq[String] = Seq("vec_id")): DataFrame = {
    val (m, subDim, cents) = collectCodebooks(codebooks)
    val qvec = microQ(SimilarityOps.toDoubleArray(col("embedding")))
    emb.select(idCols.map(col) :+
      nearestCodesMicro(qvec, m, subDim, cents).as("codes"): _*)
  }

  /** ADC top-k over a PQ-encoded corpus for a (small, broadcast) query
    * set. Each query row computes its `m×k` lookup table of EXACT
    * query-to-centroid squared sub-distances (over the same literal
    * codebooks); the broadcast join then scores each encoded row with `m`
    * array lookups — the corpus is never decompressed, never shuffled by
    * the scoring, and the salted two-phase top-k keeps reducers bounded
    * ([[SimilarityOps.bruteForceKnn]] conventions, including the
    * (distance, vec_id) tie-break and 4dp output rounding).
    * Output: (query_id, rk, vec_id, adist·4dp), `rk` 1..k by ascending
    * approximate distance. */
  def searchAdc(encoded: DataFrame, codebooks: DataFrame, queries: DataFrame,
      k: Int = 10, salts: Int = 32): DataFrame = {
    val (m, subDim, cents) = collectCodebooks(codebooks)
    val qvec = SimilarityOps.toDoubleArray(col("embedding"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      lutExpr(qvec, m, subDim, cents).as("lut")))
    // adist is an exact long (micro² units) — ranks are engine-exact; the
    // final projection converts to real-unit squared distance at 4dp.
    val scored = encoded
      .join(q, col("vec_id") =!= col("query_id")) // skip self-match
      .withColumn("adist", adcScore(col("lut"), col("codes")))
      .select(col("query_id"), col("vec_id"), col("adist"))
    val salted = scored.withColumn("salt", pmod(col("vec_id"), lit(salts)))
    val w1 = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    salted
      .withColumn("rk1", row_number().over(w1)).filter(col("rk1") <= k)
      .withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        adcToReal(col("adist")).as("adist"))
      .orderBy(col("query_id"), col("rk"))
  }
}
