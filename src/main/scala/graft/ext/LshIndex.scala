package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Append statistics for [[LshIndex.append]]. */
final case class LshAppendStats(appended: Long, postingsAdded: Long,
    bucketsTouched: Int)

/** Persistable multi-table LSH index — the build-once/query-many/append
  * form of [[SimilarityOps.lshKnn]], companion to [[IvfIndex]].
  *
  * Layout: one posting row per (vector × table) under a single composite
  * partition key `tb = table << planes | bucket`, so a query's probe set
  * (its own buckets — `queries × tables` keys, driver-tiny metadata) prunes
  * the scan to matching partition directories only (`PartitionFilters`,
  * spec-asserted). Storage is `tables`× the corpus — the standard
  * multi-table LSH trade for monotonically growing recall.
  *
  * Unlike IVF there is NO trained state: buckets are pure hashes of the
  * embedding, so [[append]] is EXACTLY equivalent to a full rebuild (the
  * spec asserts query-result equality, not recall-within-tolerance), and
  * appending never degrades the index. Hyperplanes are hash-derived
  * ([[SimilarityOps.lshBucket]]) — stable across executors, runs, and
  * engines; the index carries its (planes, tables) params so a reader can
  * never probe with mismatched hashes. */
object LshIndex {

  private def withBuckets(df: DataFrame, planes: Int, tables: Int,
      idAs: String, vecAs: String): DataFrame =
    df.select(col("vec_id").as(idAs),
      SimilarityOps.toDoubleArray(col("embedding")).as(vecAs),
      posexplode_outer(array((0 until tables).map(t =>
        SimilarityOps.lshBucket(col("embedding"), planes, t * planes)): _*))
        .as(Seq("tbl", "bucket")))
      // INT, matching the type hive-partition value inference assigns on
      // read-back (planes <= 16 keeps tbl << planes | bucket well inside).
      .withColumn("tb", ((col("tbl").cast("long") * (1L << planes))
        + col("bucket")).cast("int"))

  def build(spark: SparkSession, emb: DataFrame, path: String,
      planes: Int = 8, tables: Int = 2): Unit = {
    require(planes >= 1 && planes <= 16 && tables >= 1)
    import spark.implicits._
    Seq((planes, tables)).toDF("planes", "tables")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
    withBuckets(emb, planes, tables, "vec_id", "vec")
      .select(col("vec_id"), col("vec"), col("tb"))
      // One file per table-partition instead of tasks×tables (see
      // IvfIndex.build).
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
  }

  private def params(spark: SparkSession, path: String): (Int, Int) = {
    val p = spark.read.parquet(s"$path/params").head()
    (p.getInt(0), p.getInt(1))
  }

  /** Append embeddings: bucket with the index's own hyperplanes and merge
    * through the partition-scoped upsert — only receiving bucket
    * partitions are read/rewritten, every other posting file stays
    * byte-identical. Re-appending an existing `vec_id` updates its
    * postings in place (same embedding → same buckets). */
  def append(spark: SparkSession, emb: DataFrame,
      path: String): LshAppendStats = {
    val (planes, tables) = params(spark, path)
    // Bounded by the batch (× tables), never the index; checkpointed
    // because it feeds both the stats aggregate and the merge.
    val posting = withBuckets(emb, planes, tables, "vec_id", "vec")
      .select(col("vec_id"), col("vec"), col("tb"))
      .localCheckpoint(true)
    val s = posting.agg(countDistinct(col("vec_id")), count(lit(1)),
      countDistinct(col("tb"))).head()
    if (s.getLong(1) == 0L) return LshAppendStats(0L, 0L, 0)
    graft.sources.PartitionedMerge.upsert(spark, s"$path/postings", "tb",
      Seq("vec_id", "tb"), posting)
    LshAppendStats(s.getLong(0), s.getLong(1), s.getLong(2).toInt)
  }

  /** Top-k per query. Reads ONLY the probed bucket partitions; scoring and
    * ranking match [[SimilarityOps.lshKnn]] exactly (same hashes, same
    * multi-table candidate union, same 4dp rounding). */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 10): DataFrame = {
    val (planes, tables) = params(spark, path)
    val qb = withBuckets(queries, planes, tables, "query_id", "qvec")
      .select(col("query_id"), col("qvec"), col("tb"))
    // Static partition pruning: the probe set is per-query-set metadata.
    val tbs = qb.select("tb").distinct().collect().map(_.getInt(0))
    val posting = spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(tbs.map(Int.box): _*))
      // norm hoisted out of the candidate loop (q166/batchQuery
      // discipline); dot/(·) below is the identical IEEE tree
      .withColumn("vn", SimilarityOps.l2Norm(col("vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    posting.join(broadcast(qb.withColumn("qn",
        SimilarityOps.l2Norm(col("qvec")))), "tb")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", SimilarityOps.dot(col("vec"), col("qvec"))
        / (col("vn") * col("qn")))
      // A pair colliding in several tables produces identical rows.
      .select(col("query_id"), col("vec_id"), col("cos")).distinct()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }
}
