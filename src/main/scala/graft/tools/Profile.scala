package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.DedupOps._
// Scratch profiling main (dev only)
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $label%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s  n=$n")
    }
    val sets = docs.select(col("doc_id").as("id"), shingles(wordTokens(col("text")), 1).as("shingle_set"))
    time("shingle_sets")(sets.queryExecution.toRdd.count())
    val hashed = sets.select(col("id"), hashShingles(col("shingle_set")).as("hs"))
    time("hashed")(hashed.queryExecution.toRdd.count())
    val banded = hashed.select(col("id"), posexplode(bandKeys(minhashFromHashes(col("hs"), 64), 64, 8)).as(Seq("band","band_hash")))
    time("banded(sig+explode)")(banded.queryExecution.toRdd.count())
    time("banded_again")(banded.queryExecution.toRdd.count())
    val buckets = banded.groupBy(col("band"), col("band_hash")).agg(collect_list(col("id")).as("ids")).filter(size(col("ids")).between(2, 64))
    time("buckets")(buckets.queryExecution.toRdd.count())
    val cand = buckets.select(explode(expr("flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(least(x, y) AS id1, greatest(x, y) AS id2))))")).as("p")).select(col("p.id1"), col("p.id2")).distinct()
    time("candidates")(cand.queryExecution.toRdd.count())
    time("full_neardup")(nearDupPairs(docs).limit(20).queryExecution.toRdd.count())
    time("full_again")(nearDupPairs(docs).limit(20).queryExecution.toRdd.count())
    spark.stop()
  }
}
