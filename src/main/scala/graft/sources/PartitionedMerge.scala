package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

final case class UpsertStats(updated: Long, inserted: Long, nPartitions: Int)

/** Partition-scoped MERGE (upsert) into a hive-partitioned parquet
  * directory: only the partitions PRESENT IN THE SOURCE are read and
  * rewritten; every other partition's files are left physically untouched
  * (asserted byte-for-byte in PartitionedMergeSpec).
  *
  * This is the 100 TB shape of a daily MERGE: the wrapper's full
  * `MERGE INTO` ([[graft.wrapper.SqlCompat]]) gives exact ANSI clause
  * semantics by rewriting the whole table — correct, and the right tool
  * for catalog-scale tables — while a fact-table upsert touching 3 of
  * 3,000 date partitions must not read the other 2,997. The partition
  * pruning composes from plain Spark pieces: the source's distinct
  * partition values (driver-tiny by definition — a MERGE touching
  * millions of partitions has bigger problems) become an `isin` filter
  * the scan turns into `PartitionFilters`, and the write uses dynamic
  * partition overwrite so only rewritten partitions replace their files.
  *
  * Correctness constraint: `keyCols` must include `partCol` — a key that
  * could move between partitions would need the rest of the table to
  * find its old row, which is exactly the full-table MERGE. Source keys
  * must be unique (checked; the ANSI multi-match error).
  */
object PartitionedMerge {

  def upsert(spark: SparkSession, dir: String, partCol: String,
      keyCols: Seq[String], source: DataFrame): UpsertStats = {
    require(keyCols.contains(partCol),
      s"merge keys must include the partition column $partCol — a " +
        "cross-partition key move requires the full-table MERGE")
    val srcDups = source.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(srcDups == 0,
      "MERGE source has duplicate keys — ambiguous per ANSI")

    val parts = source.select(col(partCol)).distinct().collect().map(_.get(0))
    val target = spark.read.parquet(dir)
    require(target.columns.sorted.sameElements(source.columns.sorted),
      s"source columns ${source.columns.sorted.mkString(",")} must match " +
        s"target ${target.columns.sorted.mkString(",")}")
    // isin over the touched partition values → PartitionFilters: the scan
    // never lists or reads any other partition's files. Materialized
    // (checkpoint bounded by the TOUCHED partitions, never the table)
    // because the rewrite below overwrites the path it was read from.
    val pruned = target.filter(col(partCol).isin(parts: _*))
      .localCheckpoint(true)

    val updated = pruned.join(source, keyCols, "left_semi").count()
    val inserted = source.count() - updated
    val merged = pruned.join(source, keyCols, "left_anti")
      .select(target.columns.map(col): _*)
      .unionByName(source.select(target.columns.map(col): _*))

    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(dir)
    UpsertStats(updated, inserted, parts.length)
  }
}
