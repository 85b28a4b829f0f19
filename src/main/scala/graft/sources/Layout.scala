package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
