package graft.wrapper

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** r9 ask #7: the dialect translations now COEXIST in one translate
  * chain (CONNECT BY → PREFERRING → QUALIFY → GROUP_CONCAT →
  * RATIO_TO_REPORT → datetime formats, plus the ASOF dispatch ahead of
  * them) — property-test randomized COMPOSITIONS against independently
  * computed DataFrame expectations to catch rewrite-ordering conflicts:
  * each trial perturbs parameters, keyword case and whitespace, so a
  * regex that accidentally anchors on another dialect's rewrite output
  * fails loudly here. */
class DialectCompositionSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def nation = {
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .createOrReplaceTempView("dc_nation")
    spark.table("dc_nation")
  }

  private def check(p: Prop, trials: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), p)
    assert(res.passed, res.status.toString)
  }

  /** Random spacing + case for a dialect keyword — the translate chain
    * must be insensitive to both. */
  private def kw(word: String): Gen[String] = for {
    c <- Gen.oneOf(word.toLowerCase, word.toUpperCase,
      word.toLowerCase.capitalize)
    pre <- Gen.oneOf(" ", "  ", "\n", "\n  ")
  } yield pre + c

  private def run(stmt: String): Seq[Seq[Any]] = {
    val w = QueryWrapper(spark)
    val (ok, res) = w.query(stmt)
    assert(ok, s"${res.errorMessage}\n$stmt")
    res.dataFrame.get.collect().toSeq.map(_.toSeq)
  }

  test("property: QUALIFY over GROUP_CONCAT composes for random groupings") {
    val n = nation
    val gen = for {
      m <- Gen.chooseNum(1, 5); k <- Gen.chooseNum(1, 4)
      q <- kw("qualify"); gc <- kw("group_concat")
    } yield (m, k, q, gc)
    check(Prop.forAll(gen) { case (m, k, q, gc) =>
      val got = run(
        s"""SELECT n_regionkey % $m AS g,
           |      $gc(n_name ORDER BY n_name SEPARATOR ';') AS names,
           |       COUNT(*) AS n
           |FROM dc_nation GROUP BY n_regionkey % $m
           |$q ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, n_regionkey % $m) <= $k
           |ORDER BY g""".stripMargin)
      val expect = n
        .groupBy((col("n_regionkey") % m).as("g"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ";")
          .as("names"), count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("n").desc, col("g"))))
        .filter(col("rn") <= k).drop("rn")
        .orderBy("g").collect().toSeq.map(_.toSeq)
      got == expect
    })
  }

  test("property: RATIO_TO_REPORT under QUALIFY composes for random k") {
    val n = nation
    val gen = for {
      k <- Gen.chooseNum(1, 5); q <- kw("qualify"); r <- kw("ratio_to_report")
    } yield (k, q, r)
    check(Prop.forAll(gen) { case (k, q, r) =>
      val got = run(
        s"""SELECT n_regionkey AS rk, n_name,
           |       FLOOR($r(n_nationkey) OVER (PARTITION BY n_regionkey)
           |             * 10000 + 0.5) / 10000 AS rr
           |FROM dc_nation
           |$q ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_name) <= $k
           |ORDER BY rk, n_name""".stripMargin)
      val wsum = Window.partitionBy(col("n_regionkey"))
      val expect = n
        .withColumn("rr", floor(col("n_nationkey") /
          sum(col("n_nationkey")).over(wsum) * 10000 + lit(0.5)) / 10000)
        .withColumn("rn", row_number().over(
          wsum.orderBy(col("n_name")))).filter(col("rn") <= k)
        .select(col("n_regionkey").as("rk"), col("n_name"), col("rr"))
        .orderBy("rk", "n_name").collect().toSeq.map(_.toSeq)
      got == expect
    })
  }

  test("property: GROUP_CONCAT + Exasol TO_CHAR datetime format in one " +
      "statement for random separators") {
    val n = nation
    val gen = for {
      sep <- Gen.oneOf(";", ",", "|"); gc <- kw("group_concat")
    } yield (sep, gc)
    check(Prop.forAll(gen) { case (sep, gc) =>
      val got = run(
        s"""SELECT TO_CHAR(DATE'2026-03-04', 'YYYY-MM-DD HH24:MI:SS') AS d,
           |       $gc(n_name ORDER BY n_name SEPARATOR '$sep') AS names
           |FROM dc_nation WHERE n_regionkey = 0""".stripMargin)
      val expect = n.filter(col("n_regionkey") === 0)
        .agg(array_join(array_sort(collect_list(col("n_name"))), sep)
          .as("names"))
        .select(lit("2026-03-04 00:00:00").as("d"), col("names"))
        .collect().toSeq.map(_.toSeq)
      got == expect
    }, trials = 10)
  }

  test("property: ASOF JOIN under a CTE prologue matches the brute as-of " +
      "for random sub-samples and both directions") {
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .createOrReplaceTempView("dc_events")
    val ev = spark.table("dc_events")
    val gen = for {
      m <- Gen.chooseNum(17, 41); leftJoin <- Gen.oneOf(true, false)
      a <- kw("asof")
    } yield (m, leftJoin, a)
    check(Prop.forAll(gen) { case (m, leftJoin, a) =>
      val joinKind = if (leftJoin) "LEFT JOIN" else "JOIN"
      val got = run(
        s"""WITH p AS (SELECT user_id, ts, MAX(value) AS pval
           |           FROM dc_events WHERE event_type = 'purchase'
           |           GROUP BY user_id, ts),
           |     e AS (SELECT event_id, user_id, ts FROM dc_events
           |           WHERE event_id % $m = 0)
           |SELECT a.event_id, b.pval
           |FROM e a $a $joinKind p b
           |  ON a.user_id = b.user_id AND a.ts >= b.ts
           |ORDER BY a.event_id""".stripMargin)
      // independent brute expectation: latest purchase at or before each
      // event, per user (max_by over the cross of qualifying pairs)
      val e = ev.filter(col("event_id") % m === 0)
        .select(col("event_id"), col("user_id").as("u"), col("ts").as("lts"))
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("pu"), col("ts").as("pts"))
        .agg(max(col("value")).as("pval"))
      val joined = e.join(p, col("u") === col("pu") &&
          col("lts") >= col("pts"), "left")
        .groupBy(col("event_id"))
        .agg(max_by(col("pval"), col("pts")).as("pval"))
      val expect = (if (leftJoin) joined
                    else joined.filter(col("pval").isNotNull))
        .orderBy("event_id").collect().toSeq.map(_.toSeq)
      got == expect
    }, trials = 10)
  }

  test("ASOF with a CTE referenced from the TAIL resolves (the prologue " +
      "rides the final statement, not just the joined sides)") {
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .createOrReplaceTempView("dc_events")
    val got = run(
      """WITH p AS (SELECT user_id, ts, MAX(value) AS pval
        |           FROM dc_events WHERE event_type = 'purchase'
        |           GROUP BY user_id, ts),
        |     keep AS (SELECT DISTINCT user_id FROM dc_events
        |              WHERE user_id < 5)
        |SELECT a.event_id, b.pval
        |FROM dc_events a ASOF LEFT JOIN p b
        |  ON a.user_id = b.user_id AND a.ts >= b.ts
        |WHERE a.user_id IN (SELECT user_id FROM keep)
        |ORDER BY a.event_id""".stripMargin)
    val ev = spark.table("dc_events")
    val e = ev.filter(col("user_id") < 5)
      .select(col("event_id"), col("user_id").as("u"), col("ts").as("lts"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("pu"), col("ts").as("pts"))
      .agg(max(col("value")).as("pval"))
    val expect = e.join(p, col("u") === col("pu") &&
        col("lts") >= col("pts"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("pval"), col("pts")).as("pval"))
      .orderBy("event_id").collect().toSeq.map(_.toSeq)
    assert(got == expect)
  }

  test("composition chain order is stable: QUALIFY + GROUP_CONCAT + " +
      "RATIO_TO_REPORT + TO_CHAR all in one statement") {
    val n = nation
    val got = run(
      """SELECT n_regionkey AS rk,
        |       GROUP_CONCAT(n_name ORDER BY n_name SEPARATOR ',') AS names,
        |       FLOOR(RATIO_TO_REPORT(COUNT(*)) OVER () * 1000 + 0.5)
        |         / 1000 AS share,
        |       TO_CHAR(DATE'2026-01-31', 'YYYY-MM-DD') AS d
        |FROM dc_nation GROUP BY n_regionkey
        |QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, n_regionkey) <= 3
        |ORDER BY rk""".stripMargin)
    val counts = n.groupBy(col("n_regionkey").as("rk"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
        .as("names"), count(lit(1)).as("cnt"))
    val expect = counts
      .withColumn("share", floor(col("cnt") /
        sum(col("cnt")).over(Window.partitionBy()) * 1000 + lit(0.5)) / 1000)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("cnt").desc, col("rk"))))
      .filter(col("rn") <= 3)
      .select(col("rk"), col("names"), col("share"),
        lit("2026-01-31").as("d"))
      .orderBy("rk").collect().toSeq.map(_.toSeq)
    assert(got == expect)
  }
}
