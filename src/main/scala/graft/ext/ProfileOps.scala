package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality column profiling: per-column row/null/distinct counts and
  * byte-wise min/max, for pre-load validation and drift monitoring — the
  * check an ETL job (the reference's domain) runs before committing a load.
  *
  * Shape at 100 TB: ONE full scan. All per-column aggregates are computed
  * in a single `agg` (Spark evaluates them in one pass over the data); the
  * wide 1-row result is then unpivoted driver-side via `stack` into one row
  * per column. Exact `count_distinct` over several columns in one pass uses
  * Spark's expand — for very wide tables swap `approxDistinct = true` to
  * HLL sketches (bounded memory, one pass, no expand).
  *
  * min/max are computed on the string cast — byte-wise UTF-8 comparison,
  * identical in Spark and DuckDB (both compare varchar binary), so the
  * digest is oracle-stable across engines.
  */
object ProfileOps {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"${c}__distinct"),
        min(s).as(s"${c}__min"),
        max(s).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // stack(n, name1, n1, nulls1, …) → one row per profiled column.
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_s, max_s)")
      .orderBy(col("column_name"))
  }
}
