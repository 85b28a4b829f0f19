package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end training-data curation job — the "a user of the reference
  * could switch" proof: one wrapper-logged job composes ingestion, language
  * ID, quality filtering, exact dedup, near-dup removal, token stats, and a
  * curated write, with the full job_log/job_details audit trail at the end.
  * Every stage is the library's real operator, on the real testdata. */
class PipelineIntegrationSpec extends AnyFunSuite with SparkTestBase {

  test("curation pipeline: filter -> dedup -> near-dup -> stats, job-logged") {
    val dir = Files.createTempDirectory("pipeline").toString
    val store = new graft.wrapper.LogStore(spark, s"$dir/logs")
    val w = graft.wrapper.QueryWrapper(spark, Some(store), "curate_docs")

    // 1. Ingest the raw corpus (500 docs at sf0.001).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count()
    w.log("INFO", "corpus loaded", Some(total))

    // 1b. Text repair first (r7): markup strip + whitespace/control
    //     normalization — curation's first pass, pure projections.
    val cleaned = docs.withColumn("text",
      graft.ext.TextOps.normalizeWs(
        graft.ext.TextOps.stripMarkup(col("text"))))
    assert(cleaned.filter(col("text").rlike("<[^>]*>")).count() == 0)

    // 2. Language ID + quality features, joined on doc_id.
    val lang = graft.ext.TextOps.langScores(docs)
      .select(col("doc_id"), col("guessed_lang"))
    val quality = graft.ext.TextOps.qualityFeatures(docs)
      .select(col("doc_id"), col("quality"), col("n_tokens"))
    val scored = docs.join(lang, "doc_id").join(quality, "doc_id")

    // 3. Cheap pre-filter: keep docs with enough tokens.
    val kept = scored.filter(col("n_tokens") >= 5)
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)
    w.log("INFO", "quality filter", Some(nKept))

    // 4. Exact dedup (content hash, keep the smallest id).
    val deduped = kept
      .withColumn("__h", md5(col("text")))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__h")).orderBy(col("doc_id"))))
      .filter(col("__rk") === 1).drop("__h", "__rk")
    val nDeduped = deduped.count()
    assert(nDeduped <= nKept)

    // 5. Near-dup removal: drop the HIGHER id of every confirmed pair.
    val curated = graft.ext.DedupOps.dropNearDups(deduped, minJaccard = 0.8)
    val nCurated = curated.count()
    assert(nCurated <= nDeduped && nCurated > 0)
    w.log("INFO", "near-dup removal", Some(nCurated))

    // 5b. Classifier quality filter (r8): the batched-inference harness
    //     with the deterministic stand-in scorer — in deployment the
    //     fastText-style model swaps in behind the same BatchScorer.
    val modelKept = graft.ext.InferenceOps.modelFilter(
      curated, new graft.ext.InferenceOps.Md5Scorer, tau = 900000L)
    val withModel = curated.join(modelKept.select("doc_id"), "doc_id")
    val nModel = withModel.count()
    assert(nModel > 0 && nModel <= nCurated)
    w.log("INFO", "model filter", Some(nModel))

    // 5c. Per-source robust outlier drop (r8): anti-join the
    //     modified-z-score flags — contaminated length outliers leave
    //     without moving any source's median.
    val outliers = graft.ext.ProfileOps.robustOutliers(
      withModel, "source", "n_chars", "doc_id", zTenths = 20)
    val robust = withModel.join(outliers.select("doc_id"), Seq("doc_id"),
      "left_anti")
    val nRobust = robust.count()
    assert(nRobust == nModel - outliers.count() && nRobust > 0)
    w.log("INFO", "robust outlier drop", Some(nRobust))
    val curatedFinal = robust

    // 6. Token statistics over the curated set.
    val stats = graft.ext.TextOps.tokenCounts(curated)
      .agg(sum(col("ws_tokens")).as("total_tokens")).head()
    assert(stats.getLong(0) > 0)

    // 7. Pre-write data-quality gate: the id column must be non-null and
    //    unique before the corpus ships (ProfileOps, r7).
    val profile = graft.ext.ProfileOps.profile(curated, Seq("doc_id"))
      .collect()(0)
    assert(profile.getLong(2) == 0L, "doc_id nulls")          // n_nulls
    assert(profile.getLong(3) == nCurated, "doc_id distinct") // n_distinct
    w.log("INFO", "dq gate", Some(nCurated))

    // 8. Deterministic train/test split + size-balanced training shards
    //    (SplitOps r5, ShardOps r7), exported partitioned BY SHARD so a
    //    trainer reads one directory per worker.
    val split = graft.ext.SplitOps.assignSplit(curated, "doc_id")
    val train = split.filter(col("split") === "train")
    val sharded = graft.ext.ShardOps.assignShards(
      train.withColumn("n_chars", length(col("text"))),
      nShards = 4, sizeCol = "n_chars", tieBreaker = "doc_id")
    sharded.select("doc_id", "text", "shard")
      .write.partitionBy("shard").parquet(s"$dir/train_shards")
    val shardSizes = spark.read.parquet(s"$dir/train_shards")
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(shardSizes.length == 4 && shardSizes.max - shardSizes.min <= 1)
    w.log("INFO", "train shards", Some(shardSizes.sum))

    // 8c. Sequence packing (r8): fixed token budgets per pack inside
    //     size-balanced shards — every doc exactly once, no pack over
    //     budget unless one doc alone exceeds it.
    val packed = graft.ext.PackOps.packGreedy(
      graft.ext.TextOps.tokenCounts(curatedFinal)
        .select(col("doc_id"), col("ws_tokens")),
      nShards = 4, tokenCol = "ws_tokens", idCol = "doc_id",
      maxTokens = 512)
    assert(packed.count() == nRobust) // every curated doc packed once
    val overBudget = packed.groupBy("shard", "pack")
      .agg(sum(col("tokens")).as("pt"), count(lit(1)).as("n"))
      .filter(col("pt") > 512 && col("n") > 1).count()
    assert(overBudget == 0, "a multi-doc pack exceeded its budget")
    w.log("INFO", "packed", Some(packed.count()))

    // 8b. Epoch upsampling (r7): equalize the language mix of the train
    //     set — copies bounded, copy_idx materialized, no corpus shuffle.
    val upsampled = graft.ext.SamplingOps.epochUpsample(
      train.select("doc_id", "text", "lang"), "lang", alpha = 1.0, cap = 4)
    val perLang = upsampled.groupBy("lang").count()
      .collect().map(_.getLong(1))
    val rawPerLang = train.groupBy("lang").count()
      .collect().map(_.getLong(1))
    // the rebalance strictly narrows the stratum-size spread
    assert(perLang.max.toDouble / perLang.min <
      rawPerLang.max.toDouble / rawPerLang.min)
    w.log("INFO", "epoch upsample", Some(upsampled.count()))

    // 8d. Weighted mixture selection (r9): the reproducible per-source
    //     weighted draw (Efraimidis–Spirakis, md5-derived uniforms) —
    //     the selection step importance weights feed into. Same sample
    //     from any physical layout.
    val mix = graft.ext.SamplingOps.weightedSampleStratified(
      curatedFinal.select("doc_id", "source", "n_chars"),
      idCol = "doc_id", strataCol = "source", weightCol = "n_chars", k = 5)
    val mixIds = mix.select("doc_id").collect().map(_.getLong(0)).toSet
    val mixIds2 = graft.ext.SamplingOps.weightedSampleStratified(
      curatedFinal.select("doc_id", "source", "n_chars").repartition(11),
      idCol = "doc_id", strataCol = "source", weightCol = "n_chars", k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mixIds == mixIds2 && mixIds.nonEmpty)
    w.log("INFO", "weighted mix", Some(mixIds.size.toLong))

    // 9. Write the curated corpus; quick audit roundtrip.
    curated.select("doc_id", "text").write.parquet(s"$dir/curated")
    assert(spark.read.parquet(s"$dir/curated").count() == nCurated)

    // 10. Close the job; the audit trail holds every stage with rowcounts.
    w.finish()
    val jl = store.jobLog.collect()
    assert(jl.length == 1 && jl(0).getString(2) == "FINISHED SUCCESSFULLY")
    val details = store.jobDetails.orderBy("detail_id").collect()
    val byMsg = details.map(r => r.getString(4) ->
      (if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    assert(byMsg("corpus loaded") == total)
    assert(byMsg("quality filter") == nKept)
    assert(byMsg("near-dup removal") == nCurated)
  }
}
