package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FilterExec, GlobalLimitExec, ProjectExec, SortExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Dev tool: sweep EVERY declared query's physical plan for the two
  * always-a-scale-bug shapes — an unpartitioned `WindowExec` whose
  * input is NOT already row-bounded (one reducer swallows the whole
  * input) and a `CartesianProductExec` (unpartitioned all-pairs;
  * broadcast nested loops over tiny sides are fine and NOT flagged).
  * An empty-partition window fed through `TakeOrderedAndProject` /
  * `GlobalLimit` / `WindowGroupLimit` is accepted: Spark's rank-limit
  * inference already bounded the reducer's input (q133's QUALIFY
  * top-25 plans this way). Prints one line per offender and exits
  * non-zero if any are found, so it can gate a round close.
  * Usage: runMain graft.PlanAudit [sfDir] [queryName ...]
  * GRAFT_NO_BROADCAST=1 additionally shows what the plans do once no
  * join side fits a broadcast (the 100 TB join-strategy view). */
object PlanAudit {

  /** Queries allowed to keep a genuinely unpartitioned window, each
    * with the reason the one-reducer input stays bounded at 100 TB. */
  private val allowedUnpartitioned: Map[String, String] = Map(
    "q160_ratio_to_report" ->
      ("the user's RATIO_TO_REPORT(...) OVER () runs post-aggregate " +
        "over the c_mktsegment grouping — a value-DOMAIN-bounded " +
        "handful of rows at any data volume"))

  /** The window's one reducer is safe if, descending through
    * row-preserving nodes, its input is already limit-bounded. */
  private def boundedInput(p: SparkPlan): Boolean = p match {
    case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
        _: WindowGroupLimitExec => true
    case n @ (_: ProjectExec | _: FilterExec | _: SortExec) =>
      boundedInput(n.children.head)
    case _ => false
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE's AdaptiveSparkPlanExec wrapper has NO children, so a
      // TreeNode.foreach over the executed plan would silently scan
      // nothing; disable it so the sweep walks the real physical tree.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("GRAFT_NO_BROADCAST").contains("1"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    var offenders = 0
    def flag(name: String, what: String): Unit = {
      offenders += 1
      println(s"FLAG $name: $what")
    }
    names.foreach { name =>
      try {
        val plan: SparkPlan =
          SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
        plan.foreach {
          case w: WindowExec if w.partitionSpec.isEmpty &&
              !boundedInput(w.child) =>
            if (allowedUnpartitioned.contains(name))
              println(s"ALLOW $name: ${allowedUnpartitioned(name)}")
            else
              flag(name, "unpartitioned WindowExec: " +
                w.windowExpression.map(_.sql).mkString(", ").take(140))
          case _: CartesianProductExec =>
            flag(name, "CartesianProductExec")
          case _ => ()
        }
      } catch {
        case e: Throwable =>
          flag(name, s"plan failed: ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    println(s"PlanAudit: ${names.size} queries scanned, $offenders flagged")
    spark.stop()
    if (offenders > 0) sys.exit(1)
  }
}
