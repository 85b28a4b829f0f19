package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout for repeated big joins/aggregations — the 100 TB
  * lever Spark gives you at write time.
  *
  * Bucketing hash-partitions data into a fixed number of files per the
  * bucket key at WRITE time; every later equi-join or aggregation on that
  * key is bucket-local — no Exchange in the plan, verified in
  * LayoutSpec. For a fact table joined daily on the same key, this trades
  * one write-side shuffle for zero read-side shuffles forever. */
object Layout {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    var w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Z-order clustered write: cluster files on the INTERLEAVED bit ranks
    * of several columns, so parquet min/max skipping prunes on predicates
    * over ANY of them — a linear sort gives narrow file ranges only on the
    * leading column; the trailing ones span the whole domain in every file
    * and never skip.
    *
    * Construction (all driver-tiny metadata + one range shuffle):
    *  1. per column, `approxQuantile` boundaries rank-normalize values
    *     into 2^bits equi-depth buckets (skew-proof: ranks, not raw
    *     values, get interleaved);
    *  2. the z-value interleaves the bucket bits — the bucket lookup is a
    *     bounded 2^bits-step fold over a literal boundary array (write-side
    *     cost only), the interleave itself a static shift/or tree;
    *  3. `repartitionByRange(nFiles)` + local sort on the z-value, write.
    *
    * Columns must be numeric (rank boundaries come from `approxQuantile`);
    * hash or dictionary-encode strings first.
    *
    * At 100 TB this is the difference between scanning every file for a
    * two-column predicate and touching O(√files) of them. */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      nFiles: Int,
      bits: Int = 8): Unit = {
    require(cols.size >= 2, "z-ordering needs at least two columns")
    require(cols.size * bits <= 62, "z-value must fit a long")
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** The interleaved-rank z-value expression for `cols` (2^bits equi-depth
    * buckets per column, NULLs in bucket 0). Exposed for testing. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val nBuckets = 1 << bits
    val bucketIdx: Seq[Column] = cols.map { c =>
      val qs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
      // relativeError 1/(4·buckets): boundaries land within a quarter
      // bucket of the true quantile — plenty for clustering.
      val bounds = df.stat.approxQuantile(c, qs, 0.25 / nBuckets).distinct
      // bucket = #boundaries ≤ value, via a broadcast-literal array fold.
      val arr = array(bounds.map(lit): _*)
      coalesce(
        aggregate(arr, lit(0),
          (acc, b) => acc + when(col(c).cast("double") >= b, 1).otherwise(0)),
        lit(0))
    }
    // Interleave: output bit (i·k + j) = bit i of column j's bucket index.
    val terms = for {
      i <- 0 until bits
      (bc, j) <- bucketIdx.zipWithIndex
    } yield shiftleft(
      shiftright(bc.cast("long"), i).bitwiseAND(lit(1L)),
      i * cols.size + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Compact every leaf partition of a hive-layout parquet directory
    * (`k=v` subdirs — the shape of a date-partitioned streaming sink, where
    * small-file debt accrues per partition). Each leaf compacts
    * independently with [[compact]]; partition values live in the directory
    * names, so rewriting a leaf's files preserves the layout. Returns
    * summed (filesBefore, filesAfter). */
  def compactPartitioned(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path): Seq[Path] = {
      val dirs = fs.listStatus(p).filter(s =>
        s.isDirectory && s.getPath.getName.contains("="))
      if (dirs.isEmpty) Seq(p) else dirs.toSeq.flatMap(d => leaves(d.getPath))
    }
    leaves(root)
      .map(l => compact(spark, l.toString, targetFileBytes))
      .foldLeft((0, 0)) { case ((b, a), (lb, la)) => (b + lb, a + la) }
  }

  /** Compact a small-file parquet directory (the operational debt of
    * streaming / incremental appends: every micro-batch adds files, and at
    * 100 TB a scan's task count is file-bound) into ~`targetFileBytes`
    * outputs. Sizing comes from the actual on-disk footprint, not a guess;
    * the rewrite stages alongside the data and swaps in atomically-enough
    * (write staged → verify count → delete old → rename), so a failure
    * before the swap leaves the original intact. Returns (filesBefore,
    * filesAfter). */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (parts.length <= nOut) return (parts.length, parts.length)

    val df = spark.read.parquet(dir)
    val before = df.count()
    // '=' stripped: a sibling dir named like "…day=0…" would be taken for a
    // hive partition by any concurrent directory listing.
    val staging = new Path(root.getParent,
      s"graft_compact_${root.getName.replace('=', '_')}_${java.util.UUID.randomUUID()}")
    // Swap via a backup rename, never a delete-then-rename: at every point
    // either the original or the verified compacted copy exists at a known
    // location, so no single failure can destroy both.
    val backup = new Path(root.getParent,
      s"graft_compact_bak_${root.getName.replace('=', '_')}_${java.util.UUID.randomUUID()}")
    try {
      // coalesce, not repartition: merging files needs no shuffle.
      df.coalesce(nOut).write.parquet(staging.toString)
      val staged = spark.read.schema(df.schema).parquet(staging.toString)
      require(staged.count() == before,
        s"compaction of $dir would change the row count — aborting")
      require(fs.rename(root, backup), s"could not move $root aside — aborting")
      if (!fs.rename(staging, root)) {
        fs.rename(backup, root) // restore the original
        throw new IllegalStateException(
          s"rename $staging -> $root failed; original restored")
      }
      fs.delete(backup, true)
      val after = fs.listStatus(root)
        .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
      (parts.length, after)
    } finally {
      // Reached with staging still present only when the swap never
      // happened (original intact) — safe to clean.
      if (fs.exists(staging)) fs.delete(staging, true)
    }
  }
}
