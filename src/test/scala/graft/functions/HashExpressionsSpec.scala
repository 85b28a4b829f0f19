package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions.col

/** Native sketch expressions: codegen and interpreted paths must agree, and
  * match a Scala-side model. */
class HashExpressionsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sql = spark
  import sql.implicits._

  private def model(hashes: Seq[Long], k: Int): Seq[Long] =
    (0 until k).map(j => hashes.map(h => XXH64.hashLong(h, j.toLong)).min)

  test("minhash_signature matches the Scala model (codegen path)") {
    val df = Seq((1L, Seq(11L, 22L, 33L)), (2L, Seq.empty[Long]))
      .toDF("id", "hs")
    val out = df.select(col("id"),
      HashFunctions.minhashSignature(col("hs"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == model(Seq(11L, 22L, 33L), 8))
    assert(out(2L) == Seq.fill(8)(Long.MaxValue))
  }

  test("codegen and interpreted evaluation agree") {
    val hashes = Seq(5L, -7L, 123456789L)
    val interp = MinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        hashes.toArray, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), 16)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == model(hashes, 16))
    val viaDf = Seq(Tuple1(hashes)).toDF("hs")
      .select(HashFunctions.minhashSignature(col("hs"), 16))
      .head().getSeq[Long](0)
    assert(viaDf == interp)
  }

  test("minhash_xor_signature: matches the XOR model, codegen/interpreted " +
      "agree, md5 constants mirror the SQL derivation") {
    val cs = (0 until 8).map(j => HashFunctions.md5Hash60Local(s"mhperm_$j"))
    val hashes = Seq(5L, 99L, 123456789L)
    def xmodel(hs: Seq[Long]) = cs.map(c => hs.map(_ ^ c).min)
    val viaDf = Seq((1L, hashes), (2L, Seq.empty[Long])).toDF("id", "hs")
      .select(col("id"),
        HashFunctions.minhashXorSignature(col("hs"), cs).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaDf(1L) == xmodel(hashes))
    assert(viaDf(2L) == Seq.fill(8)(Long.MaxValue))
    val interp = MinHashXorSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        hashes.toArray, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), cs)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == xmodel(hashes))
    // The driver-side constant derivation must equal the in-plan md5Hash60
    // (and hence DuckDB's CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT)).
    val inPlan = Seq("mhperm_0", "mhperm_7", "graft", "")
      .toDF("s").select(HashFunctions.md5Hash60(col("s")))
      .collect().map(_.getLong(0)).toSeq
    val local = Seq("mhperm_0", "mhperm_7", "graft", "")
      .map(HashFunctions.md5Hash60Local)
    assert(inPlan == local)
  }

  test("md5_hash60 native expression ≡ composed conv/substring/md5 " +
      "spelling ≡ local mirror (r12: the portable-lane hot path)") {
    // Property sweep: ASCII, unicode, empty, long decimals (the KMV
    // cast-bigint-to-string shape), and a 1k-char doc-like string.
    val rng = new scala.util.Random(42)
    val strs = Seq("", "a", "graft", "Ünïcødé ☃ テスト", "-9007199254740993",
      "q166q_12345", rng.nextString(1000)) ++
      (0 until 200).map(_ => rng.alphanumeric.take(rng.nextInt(30)).mkString)
    val df = strs.zipWithIndex.map(_.swap).toDF("i", "s")
    val both = df.select(col("i"),
        HashFunctions.md5Hash60(col("s")).as("native"),
        HashFunctions.md5Hash60Composed(col("s")).as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch at i=${r.getInt(0)}")
    }
    // local mirror agreement on the same sweep
    strs.zip(both.sortBy(_.getInt(0))).foreach { case (s, r) =>
      assert(HashFunctions.md5Hash60Local(s) == r.getLong(1))
    }
    // interpreted path (Literal eval, no codegen) + null propagation
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(Md5Hash60(Literal("graft")).eval(null) ==
      HashFunctions.md5Hash60Local("graft"))
    assert(Md5Hash60(Literal.create(null,
      org.apache.spark.sql.types.StringType)).eval(null) == null)
    // non-string child cast upstream: bigint column hashes as its decimal
    // string (the q17b shape)
    val viaLong = Seq(42L, -1L).toDF("v")
      .select(HashFunctions.md5Hash60(col("v"))).collect().map(_.getLong(0))
    assert(viaLong.toSeq == Seq("42", "-1").map(HashFunctions.md5Hash60Local))
  }

  test("simhash64: sign-vote semantics and codegen/interpreted agreement") {
    // A single hash votes its own bits: fingerprint == that hash's bits.
    val single = Seq(Tuple1(Seq(0x0F0FL))).toDF("hs")
      .select(HashFunctions.simhash64(col("hs"))).head().getLong(0)
    assert(single == 0x0F0FL)
    // Two identical hashes reinforce; the opposite pattern cancels to 0
    // votes per bit -> count 0 is not > 0 -> bit off.
    val cancel = Seq(Tuple1(Seq(0x5555L, ~0x5555L))).toDF("hs")
      .select(HashFunctions.simhash64(col("hs"))).head().getLong(0)
    assert(cancel == 0L)
    val interp = SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0x5555L, ~0x5555L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
      .eval(null)
    assert(interp == 0L)
  }

  test("array_dot: matches sequential-fold model; codegen and interpreted agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = Seq(1.5d, -2.0d, 0.25d, 3.0d)
    val b = Seq(4.0d, 0.5d, -8.0d, 0.1d)
    val model = a.zip(b).foldLeft(0.0d) { case (acc, (x, y)) => acc + x * y }
    // codegen path (through a DataFrame projection)
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(HashFunctions.arrayDot(col("a"), col("b")))
      .head().getDouble(0)
    assert(viaDf == model)
    // interpreted path
    val interp = ArrayDotProduct(
      Literal.create(a.toArray, ArrayType(DoubleType)),
      Literal.create(b.toArray, ArrayType(DoubleType))).eval(null)
    assert(interp == model)
    // bit-identical to the HOF spelling it replaced
    val hof = Seq((a, b)).toDF("a", "b")
      .select(org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.zip_with(col("a"), col("b"), _ * _),
        org.apache.spark.sql.functions.lit(0.0d), _ + _))
      .head().getDouble(0)
    assert(hof == viaDf)
  }
}
