package graft.wrapper

/** Driver-side named-job registry backing the `EXECUTE SCRIPT` dialect
  * statement (reference README.md:35–37, 69 — an Exasol user runs the
  * wrapper-built jobs as `EXECUTE SCRIPT etl.my_job(...)`; the scripts
  * themselves are created host-side with CREATE LUA SCRIPT, QW:22).
  *
  * Here a "script" is registered from Scala as the [[EtlJob]] shape — a
  * function from the statement's literal arguments to named steps over a
  * [[QueryWrapper]] — and `wrapper.query("EXECUTE SCRIPT name(args)")`
  * dispatches it by (case-insensitive, schema-qualified) name: the
  * statement spawns a fresh wrapper + job_log registration exactly like
  * the host engine spawns the script's own session, and the query result
  * is the finished job's messages table (the `RETURNS TABLE` analog).
  *
  * Registry state is driver-side only (like the host catalog's script
  * objects): nothing serializes to executors.
  */
object ScriptRegistry {

  /** A registered script: `steps(args)` yields the named steps the
    * statement's literal arguments parameterize; `onError` is the
    * spawned wrapper's error policy. */
  final case class Script(
      steps: Seq[Any] => Seq[(String, QueryWrapper => Any)],
      onError: String = "abort")

  private val scripts =
    new java.util.concurrent.ConcurrentHashMap[String, Script]()

  private def key(name: String): String =
    name.replace("`", "").toUpperCase

  def register(name: String, script: Script): Unit = {
    scripts.put(key(name), script); ()
  }

  def register(name: String)(
      steps: Seq[Any] => Seq[(String, QueryWrapper => Any)]): Unit =
    register(name, Script(steps))

  def drop(name: String): Unit = { scripts.remove(key(name)); () }

  def lookup(name: String): Option[Script] = Option(scripts.get(key(name)))
}
