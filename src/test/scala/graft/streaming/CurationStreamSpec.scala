package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The text-curation operators are pure projections, so the SAME Column
  * expressions must run unchanged in Structured Streaming — this is the
  * "curate the corpus as it lands" deployment of the batch pipeline.
  * Parity is asserted row-for-row against the batch run. */
class CurationStreamSpec extends AnyFunSuite with SparkTestBase {

  test("markup strip + normalize + hash score stream with batch parity") {
    val dir = Files.createTempDirectory("curation-stream").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        concat(lit("<p>"), col("text"), lit("</p> &amp; tail")).as("text"))
    docs.write.parquet(s"$dir/in")

    def curate(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("clean", graft.ext.TextOps.normalizeWs(
        graft.ext.TextOps.stripMarkup(col("text"))))
      .withColumn("score", graft.ext.TextOps.hashClassifierScore(col("clean")))
      .withColumn("n_tokens", size(graft.ext.TextOps.tokens(col("clean"))))
      .filter(col("n_tokens") >= 3)
      .select(col("doc_id"), col("clean"), col("score"))

    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(s"$dir/in")
    val q = curate(stream).writeStream
      .format("memory").queryName("curated_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val streamed = spark.table("curated_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val batch = curate(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    // the planted markup is really gone in the streamed output
    assert(streamed.forall { case (_, clean, _) => !clean.contains("<p>") })
  }
}
