package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  test("saltedJoin equals the plain join on a skewed key") {
    // 90% of left rows share key 1 (the hot key).
    val left = (1L to 1000L).map(i => (i, if (i <= 900) 1L else i)).toDF("row_id", "k")
    val right = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2")).toDF("k", "v")

    val plain = left.join(right, "k").select("row_id", "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedJoin(left, right, "k", leftUnique = "row_id")
      .select(left("row_id"), left("k"), right("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(salted.count(_._2 == 1L) == 900)
  }

  test("saltedAgg matches the direct aggregation") {
    val df = (1L to 500L).map(i => (i, if (i <= 450) "hot" else s"k$i", i.toDouble))
      .toDF("row_id", "k", "v")
    val direct = df.groupBy("k")
      .agg(count(col("v")).as("v_count"), sum(col("v")).as("v_sum"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = SkewJoin.saltedAgg(df, Seq("k"), "row_id",
      Seq(("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted == direct)
  }
}
