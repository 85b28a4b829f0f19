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
  * At real scale the standard production twist is batching the top-k
  * non-conflicting pairs per round (k merges per corpus pass instead of
  * one); the per-round shape is identical, so it is a driver-side change.
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
}
