package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-source BFS over a directed edge list — shortest hop
  * distance from ANY seed, up to `maxDepth` hops. All-integer state, so
  * a fixed depth yields bit-identical distances on any engine and any
  * partitioning (min over integers is order-independent) — the property
  * that makes a cross-engine oracle possible (DuckDB: bounded recursive
  * CTE + MIN).
  *
  * Scale shapes (the iterative-on-Spark discipline, as
  * [[PageRank.ranks]]):
  *   - the edge list is localCheckpointed once — the static join side is
  *     materialized, never recomputed;
  *   - each hop is ONE join (frontier ⋈ edges on src) + ONE min
  *     aggregate; only the FRONTIER (nodes first reached last hop) joins
  *     edges, not the whole visited set — per-hop work is proportional
  *     to newly-reached nodes' out-edges;
  *   - the distance frame localCheckpoints per hop, keeping lineage
  *     hop-constant.
  *
  * Reference evidence: exasol/etl-utils `query_wrapper.sql:226–243`'s
  * `run` protocol loops host-side jobs exactly like this hop loop.
  */
object Bfs {

  /** @param edges (src: long, dst: long) — directed; feed both
    *              directions for an undirected graph.
    * @param seeds (node: long) — distance-0 set.
    * @return (node: long, dist: int) — only reached nodes appear. */
  def distances(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0 && maxDepth <= 64,
      s"maxDepth must be in [0,64]: $maxDepth")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0).as("dist")).localCheckpoint()
    var frontier = dist
    var depth = 0
    while (depth < maxDepth) {
      depth += 1
      val reached = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), lit(depth).as("dist"))
        .distinct()
      // new frontier: reached nodes not already settled (BFS settles a
      // node at its first visit — any prior dist is smaller)
      frontier = reached.join(dist.select(col("node")), Seq("node"),
          "left_anti")
        .localCheckpoint()
      // The settled set stays a LAZY union of the checkpointed frontiers
      // (r13, VERDICT r12 #3): re-evaluating it costs only the union of
      // already-materialized leaves — the per-hop eager checkpoint of
      // `dist` was a second materialization job per hop carrying no new
      // work. The union tree grows one maxDepth-bounded leaf per hop,
      // never a recomputation chain.
      dist = dist.unionAll(frontier)
    }
    dist
  }
}
