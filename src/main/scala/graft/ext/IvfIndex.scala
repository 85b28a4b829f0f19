package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-cell append statistics: how much landed where, and how well the
  * FROZEN centroids still fit the new data (`meanAssignCos` sinking below
  * the build-time assignment quality is the re-centering signal). */
final case class IvfAppendStats(
    appended: Long, cellsTouched: Int, meanAssignCos: Double)

/** Persistable IVF index — the production shape of [[SimilarityOps.ivfKnn]]:
  * build once (k-means centroids + corpus laid out partitioned BY CELL),
  * query many times touching only the probed cells' files, [[append]] new
  * embeddings without a rebuild.
  *
  * The cell directory layout is the inverted file: a probe of `nProbe`
  * cells reads `nProbe/nCells` of the corpus (partition pruning — verified
  * in IvfIndexSpec via the scan's PartitionFilters), which is what makes
  * ANN sublinear at 100 TB. The probe list is per-query-set metadata
  * (≤ queries × nProbe cell ids) — driver-side by design. */
object IvfIndex {

  /** Cell-count sizing for a corpus of `corpusSize` vectors: ≈ √N
    * (classic IVF balance — cell size and cell count both ≈ √N, so a
    * probe reads √N·nProbe candidates), floored at the historical
    * default 16. This is also [[batchQuery]]'s PARALLELISM contract:
    * its posting⋈probe shuffle keys on `cell` alone, so reducer
    * parallelism is bounded by the number of non-empty cells — an index
    * built with the small-corpus default and then batch-queried at
    * 100 TB would bottleneck on 16 reducers no matter the cluster
    * size. Size nCells with the corpus (spec-pinned in IvfIndexSpec);
    * the per-cell work then shrinks as 1/√N per reducer while the cell
    * count supplies the scale-out. */
  def recommendedCells(corpusSize: Long): Int =
    math.max(16L, math.ceil(math.sqrt(math.max(0L, corpusSize)
      .toDouble)).toLong).min(Int.MaxValue.toLong).toInt

  def build(spark: SparkSession, emb: DataFrame, path: String,
      nCells: Int = 16, iters: Int = 2): Unit = {
    val centroids = SimilarityOps.kmeansCentroids(emb, nCells, iters)
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    assignToCentroids(emb, centroids).drop("acos")
      // Cluster by cell BEFORE the partitioned write: unclustered, every
      // write task holds an open parquet writer per cell it sees —
      // tasks×cells files (≈39k at sf10's √N=1225 cells) and the write
      // dominates the whole build. One shuffle keyed on the partition
      // column makes it one file per cell, which is also the layout the
      // DPP-pruned probe scan wants.
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Nearest-centroid assignment shared by [[build]] and [[append]]: the
    * SAME arithmetic in both places, with the score rounded to 4dp before
    * the argmax and near-ties broken to the LOWEST cell (the repo's
    * round-before-decision rule) — so re-assigning an unchanged embedding
    * always reproduces its original cell. Runs as a per-row
    * `mapPartitions` argmax over driver-collected centroids (k = O(√N)
    * rows, the PqOps codebook discipline) instead of a crossJoin: the
    * N×k blowup carried the vector array inside a `max_by` struct whose
    * non-fixed-width buffer knocked the aggregate off the hash path —
    * 40+ minutes for the sf10 build where this loop takes seconds (see
    * SimilarityOps.assignCellsMicro). Bit-identical: the same
    * ascending-index double dot (ArrayDotProduct's fold),
    * `dot/(√aa·√bb)` then `FLOOR(·1e4+0.5)/1e4` with SQL FLOOR's
    * NaN→0 long conversion, and strict `Double.compare` replacement
    * over ascending cells (NaN ordering and lowest-cell ties match the
    * struct-ordering semantics of the expression it replaced). */
  private def assignToCentroids(emb: DataFrame,
      centroids: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents: Array[(Int, Array[Double])] = centroids
      .select(col("cell"), col("centroid")).as[(Int, Array[Double])]
      .collect().sortBy(_._1)
    val cnorms: Array[Double] = cents.map { case (_, cd) =>
      var cc = 0.0d; var i = 0
      while (i < cd.length) { cc += cd(i) * cd(i); i += 1 }
      math.sqrt(cc)
    }
    val bc = spark.sparkContext.broadcast((cents, cnorms))
    emb.select(col("vec_id"),
        SimilarityOps.toDoubleArray(col("embedding")).as("vec"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (cs, nc) = bc.value
        it.map { case (id, vec) =>
          var vv = 0.0d
          var i = 0
          while (i < vec.length) { vv += vec(i) * vec(i); i += 1 }
          val nv = math.sqrt(vv)
          var bestCell = -1
          var bestCos = Double.NegativeInfinity
          var acos = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val cd = cs(c)._2
            var dp = 0.0d
            val n = math.min(vec.length, cd.length)
            i = 0
            while (i < n) { dp += vec(i) * cd(i); i += 1 }
            val cos = dp / (nv * nc(c))
            val cos4 = math.floor(cos * 10000.0d + 0.5d).toLong / 10000.0d
            if (java.lang.Double.compare(cos4, bestCos) > 0) {
              bestCos = cos4; bestCell = cs(c)._1
            }
            if (java.lang.Double.compare(cos4, acos) > 0) acos = cos4
            c += 1
          }
          (id, bestCell, vec, acos)
        }
      }.toDF("vec_id", "cell", "vec", "acos")
  }

  /** Incrementally append embeddings to a built index: each new vector is
    * assigned to its nearest EXISTING centroid (centroids stay frozen — no
    * re-clustering) and merged into the cell layout through the
    * partition-scoped upsert, so only the cells that actually receive
    * vectors are read and rewritten; every other cell's files stay
    * byte-identical. An existing `vec_id` re-appended into the same cell
    * updates in place; appending is for new/ unchanged-cell vectors — a
    * vector whose embedding moved it to a DIFFERENT cell needs the rebuild
    * (same constraint as any partition-keyed merge).
    *
    * Returns drift stats: when `meanAssignCos` sinks well below the
    * build-time assignment quality, the frozen centroids no longer fit the
    * distribution and a rebuild is due. Query recall over appended data
    * matches a rebuild's up to centroid quality (spec-checked); at
    * `nProbe = nCells` both are exhaustive and exactly equal. */
  def append(spark: SparkSession, emb: DataFrame,
      path: String): IvfAppendStats = {
    val centroids = spark.read.parquet(s"$path/centroids")
    // Checkpointed: consumed by the stats aggregate AND the merge write;
    // bounded by the appended batch, never the index.
    val assigned = assignToCentroids(emb, centroids).localCheckpoint(true)
    val s = assigned.agg(count(lit(1)), countDistinct(col("cell")),
      avg(col("acos"))).head()
    if (s.getLong(0) == 0L) return IvfAppendStats(0L, 0, Double.NaN)
    // A re-appended vec_id whose embedding moved it to a DIFFERENT cell
    // would leave the old posting in place (the merge keys on
    // (vec_id, cell)) — a silent duplicate in every query. Detect on the
    // column-pruned (vec_id, cell) index scan and refuse loudly: such
    // drift is the documented rebuild trigger.
    val moved = spark.read.parquet(s"$path/cells")
      .select(col("vec_id"), col("cell").as("__oldcell"))
      .join(assigned.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .filter(col("cell") =!= col("__oldcell")).limit(1).count()
    require(moved == 0L,
      "IvfIndex.append: a re-appended vec_id assigns to a different cell " +
        "than its resident posting — embedding drift across cells needs a " +
        "rebuild, not an append")
    graft.sources.PartitionedMerge.upsert(spark, s"$path/cells", "cell",
      Seq("vec_id", "cell"), assigned.drop("acos"))
    IvfAppendStats(s.getLong(0), s.getLong(1).toInt, s.getDouble(2))
  }

  /** Top-k per query for a LARGE query set — up to the corpus itself
    * (hard-negative mining, all-corpus kNN graphs). Same probe
    * semantics as [[query]], different physics: [[query]] broadcasts
    * the probe frame, which is only sound while `queries × nProbe`
    * stays driver-bounded; here NOTHING unbounded broadcasts —
    *
    *  1. probe selection is one bounded-heap hash aggregate per query
    *     (`collectTopK` over the `nCells`-row centroid cross — no
    *     window, no per-query sort);
    *  2. the posting join is keyed on `cell`, a co-partitioned SHUFFLE
    *     join: both sides scale out, per-reducer work is bounded by
    *     cell size × probes landing in that cell, and per-query work
    *     by its nProbe cells — never all-pairs (candidate volume is
    *     N·k after the heap, N·|cell|·nProbe/nCells during scoring).
    *     Reducer parallelism is bounded by the number of non-empty
    *     cells — build the index with [[recommendedCells]] (≈ √N) so
    *     this join scales out with the corpus, not with the
    *     small-corpus default of 16;
    *  3. the per-query top-k is the same map-side-combinable
    *     `collectTopK` heap as q164/q166.
    *
    * Ties break exactly like [[query]]: (cos DESC, vec_id ASC) for
    * candidates, (ccos DESC, cell ASC) for probes. Output schema is
    * [[query]]'s (query_id, rk, vec_id, cosine·4dp); `exactCos = true`
    * leaves `cosine` UNROUNDED so a downstream re-ranker (q166b's
    * same-label filter + top-1) can tie-break at full precision exactly
    * like the brute path, rounding only in ITS final projection —
    * candidates tied at 4dp but distinct beyond it must not flip the
    * winner between the exact and indexed lanes (ADVICE r10). */
  def batchQuery(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 10, nProbe: Int = 4, exactCos: Boolean = false): DataFrame = {
    import spark.implicits._
    import graft.functions.HashFunctions.collectTopK
    val centroids = spark.read.parquet(s"$path/centroids")
    // Probe selection as a per-row top-nProbe loop over DRIVER-COLLECTED
    // centroids (r13; the assignCellsMicro/assignToCentroids discipline —
    // centroids are k = O(√N) rows, the codebook that every executor
    // needs anyway). The previous spelling crossJoined every query
    // against every centroid — N·√N ROWS each carrying the 64-dim query
    // array — and pushed them through a collectTopK heap aggregate +
    // explode: at batch scale (queries ≈ corpus) that intermediate is
    // the N^1.5 row blowup itself, all to pick 8 ints per query. The
    // loop runs the IDENTICAL IEEE sequence per (query, centroid):
    // ascending-index double dot (ArrayDotProduct's fold),
    // `dp / (√qq · √cc)` — and selects by the exact collectTopK struct
    // ordering ((ccos, −cell) largest-first: java.lang.Double.compare,
    // NaN-largest, ties to the LOWEST cell), so the probed cell SET is
    // bit-identical. NULL embeddings emit no probes (the crossJoin
    // scored them to NULL, which the heap likewise never ranked above a
    // real score). Downstream only the (query, cell) set matters — the
    // final per-query heap re-ranks candidates from scratch.
    val cents: Array[(Int, Array[Double])] = centroids
      .select(col("cell"), col("centroid")).as[(Int, Array[Double])]
      .collect().sortBy(_._1)
    val cnorms: Array[Double] = cents.map { case (_, cd) =>
      var cc = 0.0d; var i = 0
      while (i < cd.length) { cc += cd(i) * cd(i); i += 1 }
      math.sqrt(cc)
    }
    val bc = spark.sparkContext.broadcast((cents, cnorms))
    val probes = queries
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qvec"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (cs, nc) = bc.value
        it.flatMap { case (qid, qvec) =>
          if (qvec == null || cs.isEmpty) Iterator.empty
          else {
            var qq = 0.0d
            var i = 0
            while (i < qvec.length) { qq += qvec(i) * qvec(i); i += 1 }
            val qn = math.sqrt(qq)
            val scored = new Array[(Double, Int)](cs.length)
            var c = 0
            while (c < cs.length) {
              val cd = cs(c)._2
              var dp = 0.0d
              val n = math.min(qvec.length, cd.length)
              i = 0
              while (i < n) { dp += qvec(i) * cd(i); i += 1 }
              scored(c) = (dp / (qn * nc(c)), cs(c)._1)
              c += 1
            }
            // (ccos DESC via Double.compare — NaN largest, cell ASC):
            // exactly collectTopK's (ccos, -cell) largest-first order.
            val top = scored.sortWith { (a, b) =>
              val cmp = java.lang.Double.compare(a._1, b._1)
              if (cmp != 0) cmp > 0 else a._2 < b._2
            }.take(nProbe)
            top.iterator.map(t => (qid, qvec, qn, t._2))
          }
        }
      }.toDF("query_id", "qvec", "qnorm", "cell")
    // Norms hoist to per-ROW projections on each side: `cosine()` inline
    // would recompute sqrt(dot(a,a)) and sqrt(dot(b,b)) per PAIR, and the
    // candidate stage evaluates N·|cell|·nProbe pairs — the suite's
    // single largest FMA bill at scale (3× the dots actually needed).
    // Value-identical: the division still sees Multiply(√aa, √bb).
    val posting = spark.read.parquet(s"$path/cells")
      .withColumn("vnorm", SimilarityOps.l2Norm(col("vec")))
    posting.join(probes, "cell") // shuffle join on cell — NO broadcast
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", SimilarityOps.dot(col("vec"), col("qvec")) /
        (col("vnorm") * col("qnorm")))
      .groupBy(col("query_id"))
      .agg(collectTopK(struct(col("cos"), (-col("vec_id")).as("nid")), k,
        reverse = false).as("tops"))
      .select(col("query_id"), posexplode(col("tops")).as(Seq("i", "t")))
      .select(col("query_id"), (col("i") + 1).cast("int").as("rk"),
        (-col("t.nid")).as("vec_id"),
        (if (exactCos) col("t.cos") else round(col("t.cos"), 4))
          .as("cosine"))
  }

  /** Top-k per query against a built index. Reads ONLY the probed cell
    * partitions. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 10, nProbe: Int = 4): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
      // norms hoisted out of the pair loops (the batchQuery discipline);
      // dot/(·) below is the identical IEEE tree as inline cosine
      .withColumn("cn", SimilarityOps.l2Norm(col("centroid")))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cell"))
    val probes = queries
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qvec"))
      .withColumn("qn", SimilarityOps.l2Norm(col("qvec")))
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", SimilarityOps.dot(col("qvec"), col("centroid"))
        / (col("qn") * col("cn")))
      .withColumn("pr", row_number().over(probeW)).filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qvec"), col("qn"), col("cell"))

    // Static partition pruning: the probed cell set is tiny metadata.
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0))
    val posting = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(cells.map(Int.box): _*))
      .withColumn("vn", SimilarityOps.l2Norm(col("vec")))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    posting.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", SimilarityOps.dot(col("vec"), col("qvec"))
        / (col("vn") * col("qn")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }
}
