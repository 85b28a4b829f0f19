package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.types._

class IngestSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  test("jsonLines: conforming rows pass, malformed rows quarantine verbatim") {
    val dir = Files.createTempDirectory("ing").toString
    Files.writeString(Paths.get(s"$dir/data.jsonl"),
      """{"id": 1, "name": "alpha"}
        |this is not json at all
        |{"id": 2, "name": "beta"}
        |{"id": "not-a-number", "name": "gamma"}
        |""".stripMargin)
    val res = Ingest.jsonLines(spark, s"$dir/data.jsonl", schema)
    val good = res.good.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(good.toSeq == Seq((1L, "alpha"), (2L, "beta")))
    val bad = res.quarantined.collect().map(_.getString(0))
    assert(bad.length == 2)
    assert(bad.exists(_.contains("not json")))
    assert(bad.exists(_.contains("not-a-number"))) // raw text preserved
  }

  test("csv: type-violating cells quarantine, schema rows pass") {
    val dir = Files.createTempDirectory("ingc").toString
    Files.writeString(Paths.get(s"$dir/data.csv"),
      """id,name
        |1,alpha
        |oops,beta
        |3,gamma
        |""".stripMargin)
    val res = Ingest.csv(spark, s"$dir/data.csv", schema)
    assert(res.good.count() == 2)
    assert(res.quarantined.collect().map(_.getString(0)).toSeq == Seq("oops,beta"))
  }

  test("withProvenance: stable (file, row_index) pairs, replay-addressable") {
    val dir = Files.createTempDirectory("ingp").toString
    val sql = spark
    import sql.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartition(2).write.parquet(s"$dir/t")
    def load() = Ingest.withProvenance(spark.read.parquet(s"$dir/t"))
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[String]("src_file"), r.getAs[Long]("src_row")))
      .toMap
    val first = load()
    assert(first.keySet == Set(1L, 2L, 3L))
    assert(first.values.forall(_._1.endsWith(".parquet")))
    // stable across re-reads (unlike monotonically_increasing_id)
    assert(load() == first)
    // rows in the same file get distinct indices
    first.values.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq.distinct.size == rows.size)
    }
  }
}
