package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

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
}
