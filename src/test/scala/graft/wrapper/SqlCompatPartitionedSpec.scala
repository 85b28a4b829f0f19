package graft.wrapper

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Partition-scoped dialect DML: UPDATE/DELETE/MERGE on a hive-partitioned
  * catalog table must rewrite ONLY the touched partitions — untouched
  * partitions' files stay byte-identical — and fall back to the full-table
  * rewrite exactly when the statement's effects can escape the touched set
  * (partition-column assignment, emptied partition, unpinned MERGE ON). */
class SqlCompatPartitionedSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  /** (name, size, mtime) per part-file — rewritten files always get new
    * names, so map equality ⇔ the partition was not rewritten. */
  private def fileState(dir: String): Map[String, (Long, Long)] = {
    val d = new File(dir)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.isFile).filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  private def withPartTable(name: String)(body: String => Unit): Unit = {
    val loc = Files.createTempDirectory(name).toString + "/t"
    spark.sql(s"""CREATE TABLE $name (id BIGINT, v STRING, day INT)
      USING parquet PARTITIONED BY (day) LOCATION '$loc'""")
    try {
      spark.sql(s"""INSERT INTO $name VALUES
        (1, 'a0', 0), (2, 'b0', 0),
        (3, 'c1', 1), (4, 'd1', 1),
        (5, 'e2', 2)""")
      body(loc)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("UPDATE with partition-covering WHERE rewrites only that partition") {
    withPartTable("pupd") { loc =>
      val before0 = fileState(s"$loc/day=0")
      val before2 = fileState(s"$loc/day=2")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query("UPDATE pupd SET v = 'X' WHERE day = 1 AND id = 3")
      assert(ok && res.rowsAffected.contains(1L))
      assert(fileState(s"$loc/day=0") == before0)
      assert(fileState(s"$loc/day=2") == before2)
      val rows = spark.table("pupd").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
      assert(rows == Seq((1L, "a0", 0), (2L, "b0", 0), (3L, "X", 1),
        (4L, "d1", 1), (5L, "e2", 2)))
    }
  }

  test("UPDATE without a partition predicate still only rewrites matched partitions") {
    withPartTable("pupd2") { loc =>
      val before0 = fileState(s"$loc/day=0")
      val before1 = fileState(s"$loc/day=1")
      val w = QueryWrapper(spark)
      // Matches only the day=2 row — discovery needs a scan, but the WRITE
      // must not touch day 0/1.
      val (ok, res) = w.query("UPDATE pupd2 SET v = upper(v) WHERE v = 'e2'")
      assert(ok && res.rowsAffected.contains(1L))
      assert(fileState(s"$loc/day=0") == before0)
      assert(fileState(s"$loc/day=1") == before1)
      assert(spark.table("pupd2").filter($"id" === 5).head().getString(1) == "E2")
    }
  }

  test("UPDATE matching nothing writes nothing at all") {
    withPartTable("pupd0") { loc =>
      val before = Seq(0, 1, 2).map(d => fileState(s"$loc/day=$d"))
      val w = QueryWrapper(spark)
      val (ok, res) = w.query("UPDATE pupd0 SET v = 'X' WHERE id = 999")
      assert(ok && res.rowsAffected.contains(0L))
      assert(Seq(0, 1, 2).map(d => fileState(s"$loc/day=$d")) == before)
    }
  }

  test("UPDATE assigning the partition column moves the row (full path)") {
    withPartTable("pupdm") { _ =>
      val w = QueryWrapper(spark)
      val (ok, res) = w.query("UPDATE pupdm SET day = 7 WHERE id = 5")
      assert(ok && res.rowsAffected.contains(1L))
      val moved = spark.table("pupdm").filter($"id" === 5).head()
      assert(moved.getInt(2) == 7)
      assert(spark.table("pupdm").filter($"day" === 2).count() == 0)
      assert(spark.table("pupdm").count() == 5)
    }
  }

  test("DELETE keeps untouched partitions byte-identical") {
    withPartTable("pdel") { loc =>
      val before0 = fileState(s"$loc/day=0")
      val before2 = fileState(s"$loc/day=2")
      val w = QueryWrapper(spark)
      val (ok, res) = w.query("DELETE FROM pdel WHERE day = 1 AND id = 3")
      assert(ok && res.rowsAffected.contains(1L))
      assert(fileState(s"$loc/day=0") == before0)
      assert(fileState(s"$loc/day=2") == before2)
      assert(spark.table("pdel").orderBy("id").collect().map(_.getLong(0)).toSeq
        == Seq(1L, 2L, 4L, 5L))
    }
  }

  test("DELETE that empties a partition falls back and still clears it") {
    withPartTable("pdele") { _ =>
      val w = QueryWrapper(spark)
      // day=1 has ids 3 and 4 — deleting both empties the partition, which
      // dynamic overwrite cannot express; the fallback must still clear it.
      val (ok, res) = w.query("DELETE FROM pdele WHERE day = 1")
      assert(ok && res.rowsAffected.contains(2L))
      assert(spark.table("pdele").filter($"day" === 1).count() == 0)
      assert(spark.table("pdele").orderBy("id").collect().map(_.getLong(0)).toSeq
        == Seq(1L, 2L, 5L))
    }
  }

  test("MERGE with partition-pinned ON rewrites only the source's partitions") {
    withPartTable("pmrg") { loc =>
      spark.sql("""CREATE TABLE pmrg_src (id BIGINT, v STRING, day INT)
        USING parquet""")
      try {
        // Touches day=1 (update id=3, insert id=9) and a brand-new day=9.
        spark.sql("""INSERT INTO pmrg_src VALUES
          (3, 'c1x', 1), (9, 'z1', 1), (10, 'n9', 9)""")
        val before0 = fileState(s"$loc/day=0")
        val before2 = fileState(s"$loc/day=2")
        val w = QueryWrapper(spark)
        val (ok, res) = w.query(
          """MERGE INTO pmrg t USING pmrg_src s
             ON t.id = s.id AND t.day = s.day
             WHEN MATCHED THEN UPDATE SET v = s.v
             WHEN NOT MATCHED THEN INSERT (id, v, day) VALUES (s.id, s.v, s.day)""")
        assert(ok && res.rowsAffected.contains(3L))
        assert(fileState(s"$loc/day=0") == before0)
        assert(fileState(s"$loc/day=2") == before2)
        val rows = spark.table("pmrg").orderBy("id")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
        assert(rows == Seq((1L, "a0", 0), (2L, "b0", 0), (3L, "c1x", 1),
          (4L, "d1", 1), (5L, "e2", 2), (9L, "z1", 1), (10L, "n9", 9)))
      } finally spark.sql("DROP TABLE IF EXISTS pmrg_src")
    }
  }

  test("MERGE without a partition-pinned ON takes the full path, correctly") {
    withPartTable("pmrgf") { _ =>
      spark.sql("CREATE TABLE pmrgf_src (id BIGINT, v STRING, day INT) USING parquet")
      try {
        spark.sql("INSERT INTO pmrgf_src VALUES (3, 'c1x', 1), (6, 'f0', 0)")
        val w = QueryWrapper(spark)
        val (ok, res) = w.query(
          """MERGE INTO pmrgf t USING pmrgf_src s ON t.id = s.id
             WHEN MATCHED THEN UPDATE SET v = s.v
             WHEN NOT MATCHED THEN INSERT (id, v, day) VALUES (s.id, s.v, s.day)""")
        assert(ok && res.rowsAffected.contains(2L))
        val rows = spark.table("pmrgf").orderBy("id")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(rows == Seq((1L, "a0"), (2L, "b0"), (3L, "c1x"), (4L, "d1"),
          (5L, "e2"), (6L, "f0")))
      } finally spark.sql("DROP TABLE IF EXISTS pmrgf_src")
    }
  }

  test("MERGE DELETE inside a partition stays scoped; emptying one falls back") {
    withPartTable("pmrgd") { loc =>
      spark.sql("CREATE TABLE pmrgd_src (id BIGINT, v STRING, day INT) USING parquet")
      try {
        spark.sql("INSERT INTO pmrgd_src VALUES (3, 'x', 1)")
        val before0 = fileState(s"$loc/day=0")
        val w = QueryWrapper(spark)
        val (ok, res) = w.query(
          """MERGE INTO pmrgd t USING pmrgd_src s
             ON t.id = s.id AND t.day = s.day
             WHEN MATCHED THEN DELETE""")
        assert(ok && res.rowsAffected.contains(1L))
        assert(fileState(s"$loc/day=0") == before0) // day=1 keeps id=4 → scoped
        assert(spark.table("pmrgd").count() == 4)

        // Now delete the only remaining day=1 row: partition empties → the
        // fallback full rewrite must clear it.
        spark.sql("INSERT INTO pmrgd_src VALUES (4, 'x', 1)")
        val (ok2, res2) = w.query(
          """MERGE INTO pmrgd t USING pmrgd_src s
             ON t.id = s.id AND t.day = s.day
             WHEN MATCHED THEN DELETE""")
        assert(ok2 && res2.rowsAffected.contains(1L))
        assert(spark.table("pmrgd").filter($"day" === 1).count() == 0)
        assert(spark.table("pmrgd").count() == 3)
      } finally spark.sql("DROP TABLE IF EXISTS pmrgd_src")
    }
  }

  test("multi-column partitioning: UPDATE scoped, MERGE needs every column pinned") {
    val loc = Files.createTempDirectory("pmc").toString + "/t"
    spark.sql(s"""CREATE TABLE pmc (id BIGINT, v STRING, day INT, region STRING)
      USING parquet PARTITIONED BY (day, region) LOCATION '$loc'""")
    spark.sql("CREATE TABLE pmc_src (id BIGINT, v STRING, day INT, region STRING) USING parquet")
    try {
      spark.sql("""INSERT INTO pmc VALUES
        (1, 'a', 0, 'e'), (2, 'b', 0, 'w'), (3, 'c', 1, 'e'), (4, 'd', 1, 'w')""")
      val others = Seq("day=0/region=e", "day=0/region=w", "day=1/region=w")
      val before = others.map(p => fileState(s"$loc/$p"))
      val w = QueryWrapper(spark)

      // UPDATE touching one (day, region) leaf: the other three leaves
      // keep byte-identical files.
      val (ok, res) = w.query("UPDATE pmc SET v = 'X' WHERE day = 1 AND region = 'e'")
      assert(ok && res.rowsAffected.contains(1L))
      assert(others.map(p => fileState(s"$loc/$p")) == before)
      assert(spark.table("pmc").filter($"id" === 3).head().getString(1) == "X")

      // MERGE pinning BOTH partition columns: scoped (day=0 untouched).
      spark.sql("INSERT INTO pmc_src VALUES (4, 'd2', 1, 'w'), (9, 'n', 1, 'e')")
      val b0e = fileState(s"$loc/day=0/region=e")
      val b0w = fileState(s"$loc/day=0/region=w")
      val (ok2, res2) = w.query(
        """MERGE INTO pmc t USING pmc_src s
           ON t.id = s.id AND t.day = s.day AND t.region = s.region
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT (id, v, day, region)
             VALUES (s.id, s.v, s.day, s.region)""")
      assert(ok2 && res2.rowsAffected.contains(2L))
      assert(fileState(s"$loc/day=0/region=e") == b0e)
      assert(fileState(s"$loc/day=0/region=w") == b0w)

      // MERGE pinning only day (region unpinned): full path, still correct.
      spark.sql("TRUNCATE TABLE pmc_src")
      spark.sql("INSERT INTO pmc_src VALUES (1, 'a2', 0, 'e')")
      val (ok3, res3) = w.query(
        """MERGE INTO pmc t USING pmc_src s ON t.id = s.id AND t.day = s.day
           WHEN MATCHED THEN UPDATE SET v = s.v""")
      assert(ok3 && res3.rowsAffected.contains(1L))
      val rows = spark.table("pmc").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a2"), (2L, "b"), (3L, "X"), (4L, "d2"), (9L, "n")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS pmc")
      spark.sql("DROP TABLE IF EXISTS pmc_src")
    }
  }

  test("IMPORT FROM PARQUET into a partitioned target appends only the " +
      "touched partitions (untouched partition bytes identical)") {
    withPartTable("pimp") { loc =>
      val before0 = fileState(s"$loc/day=0")
      val before1 = fileState(s"$loc/day=1")
      // source parquet holds only day=2 rows → only day=2 may change
      val src = Files.createTempDirectory("pimp_src").toString + "/s"
      Seq((10L, "j2", 2)).toDF("id", "v", "day").write.parquet(src)
      val w = QueryWrapper(spark)
      val (ok, res) = w.query(s"IMPORT INTO pimp FROM PARQUET FILE '$src'")
      assert(ok, res.error.map(_.message).getOrElse(""))
      assert(res.rowsAffected.contains(1L))
      assert(fileState(s"$loc/day=0") == before0,
        "untouched partition day=0 was rewritten")
      assert(fileState(s"$loc/day=1") == before1,
        "untouched partition day=1 was rewritten")
      assert(spark.table("pimp").filter($"day" === 2).count() == 2L)
      assert(spark.table("pimp").count() == 6L)
    }
  }

  test("the pruned read of a catalog table carries PartitionFilters") {
    withPartTable("pplan") { _ =>
      val touched = spark.table("pplan").filter($"day" === 1)
        .select("day").distinct().collect().toSeq
      val plan = spark.table("pplan")
        .filter(SqlCompat.touchedPredicate(Seq("day"), touched))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("day"), plan)
    }
  }
}
