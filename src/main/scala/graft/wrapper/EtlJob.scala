package graft.wrapper

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The script harness (reference B16: `CREATE LUA SCRIPT … EXECUTE SCRIPT`,
  * README.md:35–37, 69): an ETL job is named steps over a wrapper. `execute`
  * reproduces the reference script skeleton — construct (registers the run),
  * run each step through the `run` protocol (START/INFO/ERROR logging,
  * QW:226–243), then `finish` (RM:66) — returning the messages table that a
  * `RETURNS TABLE` script would. */
object EtlJob {

  def execute(
      spark: SparkSession,
      logStore: Option[LogStore],
      scriptName: String,
      steps: Seq[(String, QueryWrapper => Any)],
      onError: String = "abort",
      clock: () => Instant = () => Instant.now()): DataFrame = {
    val w = QueryWrapper(spark, logStore, scriptName, clock)
    w.onError = onError
    val pkg = steps.toMap
    try steps.foreach { case (name, _) => w.run(pkg, name) }
    catch {
      case e: Throwable =>
        // The run protocol has already logged ERROR; close the job like the
        // reference's failed-script path and rethrow.
        w.finish(rollback = onError == "rollback")
        throw e
    }
    w.finish()
  }
}
