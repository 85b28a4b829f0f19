package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Greedy sequence packing: group documents into packs of at most
  * `maxTokens` tokens each — the step that turns a curated corpus into
  * fixed-budget training samples (context-window filling) without
  * truncating documents.
  *
  * Greedy packing is inherently sequential, so the distributed form runs
  * it independently PER SHARD: [[ShardOps.assignShards]] first spreads
  * documents deterministically, then each shard packs its documents in
  * id order through `flatMapSortedGroups` — the iterator streams in
  * sorted order with bounded memory (never a collect_list of the shard).
  * Output = input keys + (shard, pack, pack_tokens); every document keeps
  * its identity (packing never truncates; a document larger than the
  * budget gets a pack of its own).
  *
  * Determinism: shard assignment is rank-based and reproducible
  * (ShardOpsSpec), and packing order within a shard is (id) — the same
  * packs come out of any partitioning of the input. */
object PackOps {

  final case class ShardedDoc(id: Long, shard: Int, tokens: Long)

  /** `pack_tokens` is the running total within the pack — the pack's LAST
    * row carries its final size. */
  final case class PackedDoc(id: Long, shard: Int, tokens: Long,
      pack: Long, pack_tokens: Long)

  /** @param maxTokens pack budget; each pack's token sum stays ≤ it
    *                  unless a single document exceeds it alone. */
  def packGreedy(df: DataFrame, nShards: Int, tokenCol: String,
      idCol: String, maxTokens: Long): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val sharded = ShardOps.assignShards(df, nShards, tokenCol, idCol)
      .select(col(idCol).cast("long").as("id"),
        col("shard"),
        col(tokenCol).cast("long").as("tokens"))
    sharded.as(Encoders.product[ShardedDoc])
      .groupByKey(_.shard)(Encoders.scalaInt)
      .flatMapSortedGroups(col("id")) { (_, it) =>
        var pack = 0L
        var used = 0L
        var first = true
        it.map { d =>
          // used > maxTokens - tokens, not used + tokens > maxTokens:
          // the subtraction form cannot overflow (an oversize doc makes
          // the bound negative and any used ≥ 0 opens a fresh pack).
          if (first || used > maxTokens - d.tokens) {
            pack += 1; used = 0L; first = false
          }
          used += d.tokens
          PackedDoc(d.id, d.shard, d.tokens, pack, used)
        }
      }(Encoders.product[PackedDoc])
      .toDF()
  }
}
