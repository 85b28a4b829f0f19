package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Batched MODEL-INFERENCE plumbing for quality filtering — the
  * "score every document with a classifier, keep the good ones" stage of
  * a training-data pipeline (fastText-style LM filters, toxicity models,
  * rerankers). The reference wrapper would push this to a host UDF
  * (`query_wrapper.sql:40`); on Spark the real production shape is
  * `mapPartitions` with per-partition model init and fixed-size batches,
  * which no Catalyst expression can express (the model is an external
  * artifact) — the same justified-`mapPartitions` case as the multimodal
  * codec harness, and like it the PLUMBING here is real and fully tested
  * while the bundled scorer is a deterministic stand-in (no model
  * runtimes ship in this environment).
  *
  * Contracts the harness guarantees (spec-pinned):
  *   - `init()` runs once per task, before the first batch — where a real
  *     scorer loads weights;
  *   - batches never exceed `batchSize` and arrive in partition order;
  *     scores are zipped back positionally, so output rows = input rows;
  *   - batch boundaries are INVISIBLE: any `batchSize` yields identical
  *     results (a scorer must be row-independent; the spec enforces it
  *     for the bundled one);
  *   - NULL text never reaches the scorer — it scores NULL (SQL-style),
  *     routed around the batch.
  *
  * [[Md5Scorer]], the bundled stand-in, is *oracle-checkable*: its score
  * is the first 5 md5 nibbles of `m_<id>:<text>` as an integer in
  * [0, 16⁵) — integer end to end, reproduced verbatim by DuckDB's `MD5`
  * in the q112 oracle (the q100 md5-derivation pattern), so even the
  * no-model path is hash-compared cross-engine, not just spec-asserted.
  */
object InferenceOps {

  /** A batch scorer: stateful per task (init once), row-independent. */
  trait BatchScorer extends Serializable {
    /** Called once per task before any batch — load the model here. */
    def init(): Unit = ()
    /** Score one batch; must return exactly `ids.length` scores. */
    def scoreBatch(ids: Array[Long], texts: Array[String]): Array[Long]
  }

  /** The deterministic no-model stand-in (see object doc). */
  final class Md5Scorer extends BatchScorer {
    @transient private var md: java.security.MessageDigest = _
    override def init(): Unit =
      md = java.security.MessageDigest.getInstance("MD5")
    def scoreBatch(ids: Array[Long], texts: Array[String]): Array[Long] =
      ids.indices.map { i =>
        val hex = md.digest(s"m_${ids(i)}:${texts(i)}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .take(3).map(b => f"$b%02x").mkString // ≥ 5 nibbles
        java.lang.Long.parseLong(hex.substring(0, 5), 16)
      }.toArray
  }

  /** Score `df` with `scorer` in `batchSize` batches. Output: the input
    * columns narrowed to (`idCol`, score_u) — score_u LONG, NULL for
    * NULL text. One narrow pass, no shuffle; partition count (and so
    * model-load count) is the caller's layout decision. */
  def scoreBatched(df: DataFrame, scorer: BatchScorer,
      idCol: String = "doc_id", textCol: String = "text",
      batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, "batchSize must be at least 1")
    val in = df.select(col(idCol).cast("long"), col(textCol))
    val outSchema = new StructType()
      .add(idCol, LongType, nullable = false)
      .add("score_u", LongType, nullable = true)
    in.mapPartitions { it =>
      var inited = false
      it.grouped(batchSize).flatMap { chunk =>
        if (!inited) { scorer.init(); inited = true }
        val (scored, nulls) = chunk.partition(r => !r.isNullAt(1))
        val ids = scored.map(_.getLong(0)).toArray
        val scores = scorer.scoreBatch(ids,
          scored.map(_.getString(1)).toArray)
        require(scores.length == ids.length,
          s"scorer returned ${scores.length} scores for ${ids.length} rows")
        ids.indices.map(i => Row(ids(i), scores(i))) ++
          nulls.map(r => Row(r.getLong(0), null))
      }
    }(Encoders.row(outSchema))
  }

  /** Model-score floor filter: keep rows scoring BELOW `tau` (lower =
    * better for perplexity-style scores). NULL scores drop, SQL-style. */
  def modelFilter(df: DataFrame, scorer: BatchScorer, tau: Long,
      idCol: String = "doc_id", textCol: String = "text",
      batchSize: Int = 64): DataFrame =
    scoreBatched(df, scorer, idCol, textCol, batchSize)
      .filter(col("score_u") < tau)
      .orderBy(col(idCol))
}
