package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan–Albert–
  * Kumara 2007, Phys. Rev. E 76:036106) with DETERMINISTIC semantics:
  * labels start as the node id; each round every node adopts the most
  * frequent label among its neighbors, ties broken by the SMALLEST label.
  * Classic LPA breaks ties randomly and updates asynchronously; the
  * synchronous min-tie-break variant trades a little community quality for
  * bit-reproducibility (the house rand()-free rule — a re-run or resumed
  * job assigns identical communities) and is oracle-checkable round for
  * round.
  *
  * Scale shape: per round = ONE join of the (checkpointed, iteration-
  * constant) edge table to the current label table plus two node-keyed
  * hash aggregations — 2 shuffles, each bounded by |E|; no per-node
  * windows, no collect. Lineage stays flat via `localCheckpoint` per
  * round, the same discipline as [[PageRank]] (on a real cluster,
  * `checkpoint` to reliable storage instead). The argmax is an orderable-
  * struct `max` — (count, −label) lexicographic — so the tie-break costs
  * nothing extra.
  *
  * Contract: `edges(src, dst)` must contain BOTH directions of every
  * undirected edge (so every node appears as `src` and neighbor counts
  * are complete). Self-loops are permitted and count like any edge.
  */
object LabelPropagation {

  /** Fixed-round synchronous LPA. Returns (node, label); nodes sharing a
    * label after `iters` rounds are one community. */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      // neighbor labels: edge (src <- dst's current label)
      val neigh = e
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("label"))
      // most frequent neighbor label, smallest label on ties: one
      // orderable-struct max over (cnt, -label) — no window, no sort
      val next = neigh
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("label"))
      // every-2nd-round checkpoint (r13, VERDICT r12 #3): a round's label
      // frame is consumed exactly once (the next round's join), so a
      // 2-round-deep lazy plan recomputes nothing and the eager
      // materialization job per round was pure fixed cost; lineage stays
      // bounded at two rounds. Same cadence as [[PageRank.ranks]].
      labels = if (i % 2 == 0 && i < iters) next.localCheckpoint() else next
    }
    labels
  }
}
