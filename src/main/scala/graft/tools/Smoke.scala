package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: replicate the driver's t1 smoke — a bare session (none of our
  * Verify/Bench confs) calling SparkEntry.entry, expecting rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n queries=${graft.SparkEntry.queries.size} oracles=${graft.SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
