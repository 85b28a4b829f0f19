package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling (Seidman 1983; the distributed round form of
  * Montresor et al. 2013): repeatedly delete every node whose degree in
  * the REMAINING graph is < k. Nodes surviving all rounds approximate the
  * k-core from above; with enough rounds the result IS the k-core (the
  * peel is monotone — once the edge set stops shrinking it is the
  * fixpoint). The standard community/spam screen over co-occurrence
  * graphs: hubs survive, tendrils and chains fall off.
  *
  * `rounds` is part of the semantics (like PageRank's iteration count):
  * a FIXED number of peel rounds, so the output is deterministic on any
  * engine/partitioning — every step is integer degree counting and
  * semi-joins, so the operator carries a plain unrolled-CTE SQL oracle.
  *
  * Shape at 100 TB: each round = one degree aggregate (explode + count)
  * plus two semi-joins of the edge list against the ≥k survivor set —
  * all equi-shuffles on node id, never all-pairs, and the edge set only
  * shrinks. `localCheckpoint` after each round keeps the lineage
  * iteration-constant (the PageRank driver-loop lesson: without it the
  * plan re-derives all previous rounds every round).
  *
  * Input: undirected edges (u, v); self-loops dropped, duplicate /
  * reversed pairs collapse. Output: (node, deg) for nodes still in the
  * graph after `rounds` peels, with their remaining degree, node-ordered.
  */
object KCore {

  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k>=1, rounds>=1; got k=$k rounds=$rounds")
    var e = edges
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("n"))
      e = e
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
    }
    e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .orderBy(col("node"))
  }
}
