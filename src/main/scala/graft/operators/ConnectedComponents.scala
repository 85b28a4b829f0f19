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
        "graph diameter exceeds maxIter (raise it, or use a log-round variant)")
    labels
  }
}
