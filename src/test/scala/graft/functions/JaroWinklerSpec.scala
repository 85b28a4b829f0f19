package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler: cross-checked against DuckDB 1.0's
  * `jaro_winkler_similarity` (the q154 oracle engine) on literature and
  * fixture-shaped pairs; codegen and interpreted paths must agree, and
  * the SQL dialect spelling must resolve. */
class JaroWinklerSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  // select jaro_winkler_similarity(a, b) in DuckDB 1.0 — exact doubles.
  private val duckdb: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("duane", "dwayne", 0.8400000000000001),
    ("small ring", "small rings", 0.9818181818181818),
    ("crane", "crate", 0.9066666666666667),
    ("jones", "johnson", 0.8323809523809523),
    ("fvie", "ten", 0.0),
    ("abc", "", 0.0),
    ("", "", 0.0), // DuckDB convention (textbook says 1.0)
    ("a", "a", 1.0))

  test("matches DuckDB bit-for-bit on reference pairs (interpreted)") {
    duckdb.foreach { case (a, b, want) =>
      val got = JaroWinklerAlgo.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == want, s"($a, $b): got $got want $want")
    }
  }

  test("symmetric, and codegen path agrees with interpreted") {
    val df = duckdb.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val rows = df.select(
      HashFunctions.jaroWinkler(col("a"), col("b")).as("ab"),
      HashFunctions.jaroWinkler(col("b"), col("a")).as("ba"))
      .collect()
    rows.zip(duckdb).foreach { case (r, (a, b, want)) =>
      assert(r.getDouble(0) == want, s"codegen ($a, $b)")
      assert(r.getDouble(0) == r.getDouble(1), s"symmetry ($a, $b)")
    }
  }

  test("SQL dialect spelling jaro_winkler(a, b) resolves") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(got == 0.9611111111111111)
  }
}
