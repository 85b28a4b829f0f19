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
  *  - nothing draws randomness: init is hash-ordered, argmins round to
  *    4dp before deciding and break ties toward the LOWEST code (the
  *    repo's round-before-decision rule), so codes are reproducible
  *    across runs, engines, and partitionings.
  */
object PqOps {

  /** Squared L2 between two array columns. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0.0d), (acc, x) => acc + x)

  /** The whole codebook as ONE nested literal (m × k × subDim doubles),
    * via `typedlit` — a single Literal node, so the per-row work is HOF
    * loops over a constant, NOT a per-(sub, code) expression forest (a
    * 32×32 codebook spelled as 1024 separate aggregate expressions costs
    * tens of seconds of analysis + codegen before the first row moves,
    * and even an `array(array(array(lit…)))` spelling re-folds a ~2k-node
    * tree per plan; both measured on q101). */
  private def cbLiteral(cents: Array[Array[Array[Double]]]): Column =
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
    * Init: the k rows with the smallest `(xxhash64(vec_id), vec_id)` seed
    * code c of EVERY subspace with their c-th sub-vector (the
    * [[SimilarityOps.kmeansCentroids]] convention, per subspace). Each
    * round: nearest-code assignment against broadcast centroids
    * (4dp-rounded distance, lowest-code ties), then per-(sub, code) means
    * in ONE `Summarizer.mean` shuffle; a code that captures no vectors
    * keeps its previous centroid, so codebooks stay DENSE (exactly
    * `m·k` rows — [[encode]]/[[searchAdc]] index by code position).
    *
    * Returns (sub, code, centroid: array<double>). */
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
        SimilarityOps.toDoubleArray(col("embedding")).as("vec"))
      .localCheckpoint()
    val seeds = vecs.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(seeds.length == k,
      s"PQ training sample has ${seeds.length} rows < k=$k")
    // Codebooks live on the DRIVER between rounds (m·k·subDim doubles —
    // tiny by construction). Each round is then ONE Spark job with ONE
    // shuffle: assignment is a pure projection against the literal
    // codebook (the same expression encode uses — no broadcast join, no
    // per-(vec, sub) argmin shuffle; restructuring from the
    // join+groupBy spelling cut q101's training from ~12 s to ~2 s), and
    // the per-(sub, code) means partial-aggregate through Summarizer.
    val cents: Array[Array[Array[Double]]] =
      Array.tabulate(m, k)((s, c) => seeds(c).slice(s * subDim, (s + 1) * subDim))
    (1 to iters).foreach { _ =>
      val pairs = zip_with(nearestCodes(col("vec"), m, subDim, cents),
        subVectors(col("vec"), m, subDim),
        (c, v) => struct(c.as("code"), v.as("svec")))
      val means = vecs.select(posexplode(pairs).as(Seq("sub", "p")))
        .select(col("sub"), col("p.code").as("code"),
          array_to_vector(col("p.svec")).as("v"))
        .groupBy(col("sub"), col("code"))
        .agg(Summarizer.mean(col("v")).as("mv"))
        .select(col("sub"), col("code"), vector_to_array(col("mv")).as("mean"))
        .collect()
      // Empty codes keep their previous centroid — codebooks stay dense.
      means.foreach(r =>
        cents(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    }
    (0 until m).flatMap(s => (0 until k).map(c => (s, c, cents(s)(c).toSeq)))
      .toDF("sub", "code", "centroid")
  }

  /** Nearest-code ids (array<int>, one per subspace) for an embedding
    * against the literal codebook — shared by [[trainCodebooks]]'s
    * assignment step and [[encode]]. 4dp-rounded distances, first
    * (= lowest) code on ties via `array_position` of the min; the
    * distance array is bound through the single-element-transform "let"
    * so it is computed once, not once per reference (the quantizeInt8
    * lesson). */
  /** The `m×k` ADC lookup table for one query-side vector: exact squared
    * sub-distances to every code of every subspace — shared by
    * [[searchAdc]] and [[IvfPq.query]] (there over the RESIDUAL vector). */
  private[ext] def lutExpr(vec: Column, m: Int, subDim: Int,
      cents: Array[Array[Array[Double]]]): Column =
    zip_with(subVectors(vec, m, subDim), cbLiteral(cents),
      (sv, cbs) => transform(cbs, c => l2sq(sv, c)))

  /** ADC score for one encoded row against a query's LUT: `m` lookups. */
  private[ext] def adcScore(lut: Column, codes: Column): Column =
    aggregate(zip_with(lut, codes, (l, c) => element_at(l, c + 1)),
      lit(0.0d), (acc, x) => acc + x)

  private def nearestCodes(vec: Column, m: Int, subDim: Int,
      cents: Array[Array[Array[Double]]]): Column =
    zip_with(subVectors(vec, m, subDim), cbLiteral(cents),
      (sv, cbs) => {
        val dists = transform(cbs, c =>
          floor(l2sq(sv, c) * 10000 + lit(0.5)) / 10000)
        element_at(transform(array(dists), dd =>
          (array_position(dd, array_min(dd)) - 1).cast("int")), 1)
      })

  /** Driver-side dense codebook image: `(m, subDim, cents(sub)(code))`.
    * Tiny by construction (`m·k·subDim` doubles). */
  private[ext] def collectCodebooks(codebooks: DataFrame)
      : (Int, Int, Array[Array[Array[Double]]]) = {
    val rows = codebooks.select(col("sub"), col("code"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    require(rows.length == m * k, s"codebooks not dense: ${rows.length} rows" +
      s" for m=$m k=$k")
    val cents = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (s, c, v) => cents(s)(c) = v }
    (m, cents(0)(0).length, cents)
  }

  /** Compress every embedding to its `m` code ids — a pure projection
    * over the constant-folded codebook literal: no shuffle, no join, scan
    * speed at any corpus size. Per sub-vector: 4dp-rounded distances to
    * the sub's codes, first (= lowest) code on ties via `array_position`
    * of the min; the distance array is bound through the
    * single-element-transform "let" so it is computed once, not once per
    * reference (the quantizeInt8 lesson). Output: (`idCol`,
    * codes: array<int>). */
  def encode(emb: DataFrame, codebooks: DataFrame,
      idCols: Seq[String] = Seq("vec_id")): DataFrame = {
    val (m, subDim, cents) = collectCodebooks(codebooks)
    val vec = SimilarityOps.toDoubleArray(col("embedding"))
    emb.select(idCols.map(col) :+
      nearestCodes(vec, m, subDim, cents).as("codes"): _*)
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
        (floor(col("adist") * 10000 + lit(0.5)) / 10000).as("adist"))
      .orderBy(col("query_id"), col("rk"))
  }
}
