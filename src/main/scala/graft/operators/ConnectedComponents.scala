package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * missing step between near-duplicate PAIRS and deduplication CLUSTERS:
  * MinHash/SimHash/embedding candidates give edges; a training-data
  * pipeline needs one canonical document per component (and the component
  * id for provenance).
  *
  * Algorithm: iterative minimum-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * own and its neighbors' labels; fixpoint = every node carries its
  * component's minimum id. Each round is one join + one aggregate (two
  * bounded shuffles), and labels are `localCheckpoint`ed so lineage stays
  * flat across rounds. Round count = graph diameter — the right trade for
  * dedup graphs, whose clusters are small and shallow; an adversarial
  * long-path graph would want the O(log n) large-star/small-star
  * alternation (Kiveris et al., MapReduce CC), which this API could adopt
  * without changing callers. */
object ConnectedComponents {

  /** (id, comp) for every node that appears in `edges`; `comp` is the
    * smallest id in the node's component. NULL endpoints are dropped. */
  def labels(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges
        .select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct() // parallel edges add nothing but join width
      .localCheckpoint(true) // reused every round
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      it += 1
      val nbrMin = sym
        .join(labels.select(col("id").as("b"), col("comp").as("bcomp")), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("bcomp")).as("nmin"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          (coalesce(col("nmin"), col("comp")) < col("comp")).as("__chg"))
        .localCheckpoint(true) // one materialization serves count + next round
      changed = updated.filter(col("__chg")).count()
      labels = updated.drop("__chg")
    }
    require(changed == 0,
      s"connected components did not converge in $maxIter rounds — " +
        "graph diameter exceeds maxIter (raise it, or use labelsLogRounds)")
    labels
  }

  /** The O(log n)-round alternating large-star/small-star algorithm
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — same output contract as [[labels]], but round count is
    * logarithmic in component size instead of linear in graph DIAMETER,
    * so it survives long-path topologies (citation chains, linked lists
    * of near-identical revisions) that would starve min-label
    * propagation. Each round is two groupBy-join passes over the edge
    * set; the edge set only shrinks toward the final star forest.
    *
    *  - large-star: every node connects its LARGER neighbors to its
    *    neighborhood minimum — long tails collapse onto local minima;
    *  - small-star: every node re-hangs its smaller-or-equal neighbors
    *    (and itself) onto the minimum of its smaller neighborhood —
    *    local minima chain down toward the component minimum.
    *
    * Fixpoint = a forest of stars rooted at each component's minimum id.
    * Convergence is detected by edge-set equality (count + order-free
    * xxhash64 checksum — two tiny aggregates, no sort). */
  def labelsLogRounds(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val init = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val nodes = init.select(col("u").as("id"))
      .union(init.select(col("v").as("id")))
      .distinct()
      .localCheckpoint(true)

    // (count, order-independent checksum) — cheap edge-set fingerprint.
    // bit_xor, not sum: XOR never overflows (sum of hashes throws under
    // ANSI), and the edge set is distinct so XOR self-cancellation only
    // occurs via 64-bit hash collision.
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      sym.join(mins, "u")
        .filter(col("v") > col("u")) // larger neighbors re-hang onto m (< v)
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // e is (big, small)-oriented: Γ⁻(u) = exactly u's rows.
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      val hung = e.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      hung.union(mins.select(col("u"), col("m").as("v"))).distinct()
    }

    var e = init
    var fp = fingerprint(e)
    var it = 0
    var stable = false
    while (!stable && it < maxIter) {
      it += 1
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nfp = fingerprint(next)
      stable = nfp == fp
      fp = nfp
      e = next
    }
    require(stable,
      s"large-star/small-star did not converge in $maxIter rounds")
    // Star forest: every non-root points at its component's minimum.
    nodes.join(e.select(col("u").as("id"), col("v").as("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
