package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) — the engine behind Exasol's `PREFERRING`
  * clause (reference pass-through surface: the wrapper ships arbitrary
  * dialect SQL to the host engine, query_wrapper.sql:40): keep every row
  * not DOMINATED by another, where r' dominates r iff r' is ≥ r on every
  * preference dimension and > on at least one.
  *
  * Genuinely not expressible as a scale-safe relational plan: the SQL
  * spelling is a correlated NOT EXISTS over a non-equi self-join, which
  * every engine plans as a nested loop (fine for wrapper pass-through
  * compat — `SqlCompat.translatePreferring` — wrong at 100 TB). This is
  * the mapPartitions-as-last-resort case (§built-in-vs-custom): the
  * textbook two-phase distributed skyline —
  *   1. LOCAL skyline per partition (each partition's dominated rows die
  *      without shuffling; the survivor set is tiny for any correlated
  *      data distribution);
  *   2. local survivors union into one partition for the GLOBAL pass
  *      (correct because dominance is transitive: a row dominated by a
  *      dropped row is also dominated by whatever dropped it).
  * Only the local-skyline survivors ever move — the shuffle carries the
  * frontier, not the corpus. Rows with NULL in any preference dimension
  * are excluded up front (three-valued dominance is undefined).
  */
object Skyline {

  /** `dims`: (column, maximize) — `maximize = false` prefers LOW values.
    * Preference columns must be numeric (cast to double internally). */
  def pareto(df: DataFrame, dims: Seq[(String, Boolean)]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one preference dimension")
    // Higher-is-better normalized key vector (LOW dims negated).
    val keys = dims.map { case (c, hi) =>
      (if (hi) col(c) else -col(c)).cast("double") }
    val tagged = df.na.drop(dims.map(_._1)).withColumn("__k", array(keys: _*))
    val kIdx = tagged.schema.fieldIndex("__k")
    val enc = Encoders.row(tagged.schema)

    def skyline(rows: Iterator[Row]): Iterator[Row] = {
      def dominates(a: Array[Double], b: Array[Double]): Boolean = {
        var gt = false
        var i = 0
        while (i < a.length) {
          if (a(i) < b(i)) return false
          if (a(i) > b(i)) gt = true
          i += 1
        }
        gt
      }
      val sky = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Row)]
      rows.foreach { r =>
        val k = r.getSeq[Double](kIdx).toArray
        if (!sky.exists { case (s, _) => dominates(s, k) }) {
          // incoming survivor evicts anything it dominates
          val keep = sky.filterNot { case (s, _) => dominates(k, s) }
          sky.clear()
          sky ++= keep
          sky += ((k, r))
        }
      }
      sky.iterator.map(_._2)
    }

    tagged
      .mapPartitions(skyline _)(enc)   // phase 1: local, no shuffle
      .repartition(1)                  // survivors only
      .mapPartitions(skyline _)(enc)   // phase 2: global
      .drop("__k")
  }
}
