package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed production ANN layout (FAISS's `IVFPQ`; Jégou et
  * al. 2011 §V): an [[IvfIndex]]-style coarse quantizer routes each vector
  * to a cell, and [[PqOps]] codes store only the RESIDUAL
  * `vec − cellCentroid` in `m` bytes. Queries probe `nProbe` cells
  * (partition pruning — only those cells' files are read) and score the
  * probed postings with per-(query, cell) residual ADC lookup tables.
  *
  * Why both layers at 100 TB: IVF alone prunes IO to `nProbe/nCells` of
  * the corpus but still stores/scans full float vectors inside a cell; PQ
  * alone compresses 32× but scans every row. Composed, a probe touches
  * `nProbe/nCells` of a corpus that is ALREADY 32× smaller — and the
  * residuals PQ encodes are the small within-cell offsets, which quantize
  * much tighter than raw vectors (the classic IVFPQ accuracy win, visible
  * in IvfPqSpec: residual ADC beats plain-PQ recall at equal code budget).
  *
  * Determinism mirrors its two parents exactly: cell assignment is the
  * 4dp-rounded cosine argmax with lowest-cell ties ([[IvfIndex]]'s rule;
  * coarse ranking by cosine and residual ADC by L2 agree for the
  * unit-norm embeddings this targets, since `‖a−b‖² = 2−2·cos` there),
  * and codebook training/encode inherit [[PqOps]]'s hash-seeded,
  * rounding-gated pipeline. Nothing draws randomness.
  */
object IvfPq {

  /** Build the composed index at `path`:
    * `centroids/` (coarse cells), `codebooks/` (residual PQ codebooks),
    * `cells/` (vec_id, codes) partitioned BY CELL — the inverted file of
    * compressed postings. One corpus pass for assignment (checkpointed,
    * batch-bounded per row: cell id + m codes), `iters` PQ rounds over
    * the residuals, one partitioned write. */
  def build(spark: SparkSession, emb: DataFrame, path: String,
      nCells: Int = 16, m: Int = 16, k: Int = 16, iters: Int = 2): Unit = {
    val centroids = SimilarityOps.kmeansCentroids(emb, nCells, iters)
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // (vec_id, cell, residual-as-embedding): checkpointed because BOTH
    // codebook training and encode consume it.
    val resid = assignResiduals(emb, centroids).drop("acos")
      .localCheckpoint()
    val cb = PqOps.trainCodebooks(resid, m, k, iters)
    cb.coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    PqOps.encode(resid, cb, Seq("vec_id", "cell"))
      // One file per cell instead of tasks×cells (see IvfIndex.build).
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Nearest-cell assignment ([[IvfIndex]]'s exact rounding rule) plus
    * the residual against the chosen centroid, named `embedding` so the
    * PQ pipeline consumes it directly. */
  private def assignResiduals(emb: DataFrame,
      centroids: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        SimilarityOps.toDoubleArray(col("embedding")).as("vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos", floor(
        SimilarityOps.cosine(col("vec"), col("centroid")) * 10000
          + lit(0.5)) / 10000)
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cell"), col("vec"), col("centroid")),
          struct(col("cos"), -col("cell"))).as("best"),
        max(col("cos")).as("acos"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        zip_with(col("best.vec"), col("best.centroid"),
          (x, c) => x - c).as("embedding"),
        col("acos"))

  /** Incrementally append embeddings to a built IVF-PQ index: new vectors
    * assign to their nearest EXISTING cell and their residuals encode
    * against the FROZEN codebooks — no re-clustering, no re-training —
    * then merge into the cell layout through the partition-scoped upsert,
    * so only receiving cells are read/rewritten; every other cell's files
    * stay byte-identical ([[IvfIndex.append]]'s contract, composed with
    * PQ). Frozen-everything makes the append bit-deterministic: the same
    * batch always encodes to the same codes.
    *
    * Same drift rules as the IVF parent: a re-appended `vec_id` that now
    * assigns to a DIFFERENT cell is refused loudly (the keyed merge would
    * otherwise leave its old posting in place — a silent duplicate), and
    * a sinking `meanAssignCos` in the returned stats is the signal that
    * the frozen centroids — and with them the residual codebooks — no
    * longer fit the data and a rebuild is due. */
  def append(spark: SparkSession, emb: DataFrame,
      path: String): IvfAppendStats = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks")
    // Checkpointed: consumed by the stats aggregate, the drift check, and
    // the encode — bounded by the appended batch, never the index.
    val assigned = assignResiduals(emb, centroids).localCheckpoint(true)
    val s = assigned.agg(count(lit(1)), countDistinct(col("cell")),
      avg(col("acos"))).head()
    if (s.getLong(0) == 0L) return IvfAppendStats(0L, 0, Double.NaN)
    val moved = spark.read.parquet(s"$path/cells")
      .select(col("vec_id"), col("cell").as("__oldcell"))
      .join(assigned.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .filter(col("cell") =!= col("__oldcell")).limit(1).count()
    require(moved == 0L,
      "IvfPq.append: a re-appended vec_id assigns to a different cell " +
        "than its resident posting — embedding drift across cells needs " +
        "a rebuild, not an append")
    graft.sources.PartitionedMerge.upsert(spark, s"$path/cells", "cell",
      Seq("vec_id", "cell"),
      PqOps.encode(assigned.drop("acos"), cb, Seq("vec_id", "cell")))
    IvfAppendStats(s.getLong(0), s.getLong(1).toInt, s.getDouble(2))
  }

  /** Top-k per query. Reads ONLY the probed cells' partitions; each
    * probed (query, cell) pair carries its own residual LUT (the query's
    * residual against THAT cell's centroid vs the shared codebooks), so
    * scoring an encoded posting costs `m` array lookups — the corpus is
    * never decompressed. Probe ranking: 4dp-rounded cosine to the coarse
    * centroids, lowest cell on ties (the assignment rule). Output:
    * (query_id, rk, vec_id, adist·4dp), ascending approximate distance.
    * The per-query window is bounded by the probed postings, the same
    * contract as [[IvfIndex.query]]. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 10, nProbe: Int = 4): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val (m, subDim, cents) =
      PqOps.collectCodebooks(spark.read.parquet(s"$path/codebooks"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cell"))
    val probes = queries
      .select(col("vec_id").as("query_id"),
        SimilarityOps.toDoubleArray(col("embedding")).as("qvec"))
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", floor(
        SimilarityOps.cosine(col("qvec"), col("centroid")) * 10000
          + lit(0.5)) / 10000)
      .withColumn("pr", row_number().over(probeW)).filter(col("pr") <= nProbe)
      .select(col("query_id"), col("cell"),
        PqOps.lutExpr(
          zip_with(col("qvec"), col("centroid"), (x, c) => x - c),
          m, subDim, cents).as("lut"))

    // Static partition pruning: the probed cell set is tiny metadata.
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0))
    val posting = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(cells.map(Int.box): _*))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    posting.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      // exact long micro² score → rank, real-unit 4dp only in the output
      .withColumn("adist", PqOps.adcScore(col("lut"), col("codes")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        PqOps.adcToReal(col("adist")).as("adist"))
      .orderBy(col("query_id"), col("rk"))
  }
}
