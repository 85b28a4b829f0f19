package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-style merge induction over a corpus — the tokenizer-training
  * primitive (Sennrich et al. 2016, applied at the word level): each round
  * finds the globally most frequent ADJACENT token pair and fuses it into
  * one token, greedily left-to-right, corpus-wide.
  *
  * Spark shape per round (rounds are sequential by the algorithm's
  * definition — each merge changes the pair statistics the next round
  * counts):
  *   - pair counting is one `explode` + hash aggregate — map-side
  *     combined, the only shuffle, carrying (pair, count) rows;
  *   - the winning pair is a 1-row driver decision (count DESC, then
  *     lexicographic — deterministic across runs and engines);
  *   - applying the merge is a PROJECTION: the token array round-trips
  *     through a space-joined string and a quoted-pattern
  *     `regexp_replace`, whose left-to-right non-overlapping replacement
  *     IS greedy BPE application ("a a a" + merge(a,a) → ["a_a", "a"]);
  *   - `localCheckpoint` between rounds keeps the lineage flat (n rounds
  *     would otherwise stack n projections over the original scan).
  *
  * At real scale the production variant is [[trainMergesBatched]]: the
  * top-k token-disjoint pairs merge in ONE corpus pass (token-disjoint
  * merges leave each other's pair counts invariant — destroying or
  * creating an adjacency requires sharing a token — so their recorded
  * counts match the sequential algorithm's). A 32k-merge vocabulary then
  * costs ~32k/k corpus passes instead of 32k. [[trainMerges]] stays as the
  * one-pair-per-round reference implementation the equality spec checks
  * the batch against.
  */
object BpeOps {

  private def toksCol: Column = col("__toks")

  /** Run `nMerges` merge rounds over `docs`. Returns the ordered merge
    * table ((left, right, countAtMergeTime) per round — the artifact a
    * tokenizer ships) and the corpus with its final `tokens` column.
    * Stops early if no adjacent pair remains. Merged tokens join with
    * `_`. */
  def trainMerges(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): (Seq[(String, String, Long)], DataFrame) = {
    require(nMerges >= 1)
    var cur = docs
      .withColumn("__toks", DedupOps.wordTokens(col(textCol)))
      .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var exhausted = false
    var round = 0
    while (round < nMerges && !exhausted) {
      val top = cur
        .filter(size(toksCol) >= 2)
        .select(explode_outer(transform(
          sequence(lit(1), size(toksCol) - 1),
          i => struct(element_at(toksCol, i).as("l"),
            element_at(toksCol, i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((l, r, n))
        val pattern = "(?<=^| )" +
          java.util.regex.Pattern.quote(l + " " + r) + "(?=$| )"
        val replacement =
          java.util.regex.Matcher.quoteReplacement(l + "_" + r)
        cur = cur
          .withColumn("__toks", filter(
            split(regexp_replace(concat_ws(" ", toksCol),
              pattern, replacement), " "),
            t => length(t) > 0))
          .localCheckpoint()
      }
      round += 1
    }
    (merges.toList, cur.withColumnRenamed("__toks", "tokens"))
  }

  /** Batched merge induction: each round counts pairs ONCE, picks the top
    * `batch` token-disjoint pairs by (count DESC, lexicographic), and
    * applies them all in one projection — one corpus pass per round
    * instead of per merge. A pair sharing a token with a higher-ranked
    * chosen pair is deferred to a later round (its count would change
    * under the earlier merge). Returns (ordered merge table, corpus with
    * final `tokens`, rounds executed). With `batch = 1` the decisions are
    * exactly [[trainMerges]]'s; with disjoint top pairs the merge table is
    * identical at any batch size. */
  def trainMergesBatched(docs: DataFrame, nMerges: Int, batch: Int,
      textCol: String = "text"): (Seq[(String, String, Long)], DataFrame, Int) = {
    require(nMerges >= 1 && batch >= 1)
    var cur = docs
      .withColumn("__toks", DedupOps.wordTokens(col(textCol)))
      .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var exhausted = false
    var rounds = 0
    while (merges.size < nMerges && !exhausted) {
      val want = math.min(batch, nMerges - merges.size)
      // Over-fetch so conflict-skipped candidates don't starve the batch;
      // driver-bounded (≤ 8·batch rows of two tokens + a count).
      val top = cur
        .filter(size(toksCol) >= 2)
        .select(explode_outer(transform(
          sequence(lit(1), size(toksCol) - 1),
          i => struct(element_at(toksCol, i).as("l"),
            element_at(toksCol, i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(math.max(want * 8, 32)).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val chosen = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
        var i = 0
        while (i < top.length && chosen.size < want) {
          val (l, r, n) =
            (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          if (!used(l) && !used(r)) { chosen += ((l, r, n)); used += l; used += r }
          i += 1
        }
        merges ++= chosen
        // Token-disjoint replacements cannot interact, so chaining them in
        // one projection equals applying them corpus-pass-by-corpus-pass.
        val replaced = chosen.foldLeft(concat_ws(" ", toksCol)) {
          case (c, (l, r, _)) => regexp_replace(c,
            "(?<=^| )" + java.util.regex.Pattern.quote(l + " " + r) + "(?=$| )",
            java.util.regex.Matcher.quoteReplacement(l + "_" + r))
        }
        cur = cur
          .withColumn("__toks", filter(split(replaced, " "), t => length(t) > 0))
          .localCheckpoint()
      }
      rounds += 1
    }
    (merges.toList, cur.withColumnRenamed("__toks", "tokens"), rounds)
  }

  /** ENCODE with a trained merge table: apply the merges to a fresh corpus
    * in training order — the tokenizer's inference step. All merges chain
    * inside ONE projection (no shuffle, no driver round-trips; the merge
    * table is plan metadata, not data), so encoding is a pure scan-speed
    * map at any corpus size. Same greedy left-to-right semantics as
    * training: encoding the training corpus reproduces `trainMerges`'
    * final `tokens` column exactly (spec-checked). */
  def applyMerges(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val joined = concat_ws(" ", DedupOps.wordTokens(col(textCol)))
    val replaced = merges.foldLeft(joined) { case (c, (l, r)) =>
      regexp_replace(c,
        "(?<=^| )" + java.util.regex.Pattern.quote(l + " " + r) + "(?=$| )",
        java.util.regex.Matcher.quoteReplacement(l + "_" + r))
    }
    docs.withColumn("tokens", filter(split(replaced, " "), t => length(t) > 0))
  }
}
