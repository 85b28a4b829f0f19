package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketch hot paths.
  *
  * The HOF compositions (`transform(sequence(0,k-1), j -> array_min(...))`)
  * are correct but evaluate the per-element lambdas interpreted — profiled
  * at ~150 ns per hash eval, the dominant cost of MinHash/SimHash over a
  * corpus (k×|shingles| evals per document). These expressions generate a
  * tight primitive loop instead (whole-stage codegen'd, zero boxing,
  * single pass over the input array): the mission's "drop to a custom
  * `Expression` only where the built-ins genuinely can't" case, with
  * `nullSafeEval` kept as the interpreted fallback. */

/** `minhash_signature(hashes, k)`: element j of the result is
  * min over the input array of `XXH64(h, seed = j)`. Input: the per-shingle
  * long hashes ([[graft.ext.DedupOps.hashShingles]]); empty input yields
  * Long.MaxValue sentinels. */
final case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashLong(h, j.toLong)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int ${i}n = $c.numElements();
         |for (int $i = 0; $i < ${i}n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, (long) $j);
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `minhash_xor_signature(hashes, constants)`: element j of the result is
  * min over the input array of `h XOR constants(j)` — the XOR-permutation
  * MinHash family. XOR by a fixed constant is a bijection of the hash
  * space, and unlike [[MinHashSignature]]'s XXH64 re-hash it is
  * SQL-portable: any engine with bigint XOR rebuilds the identical
  * signature, which is what lets q30's near-dup row hash-match a DuckDB
  * oracle (the q31 portable-SimHash precedent; constants are md5-derived
  * 60-bit values so the whole lane shares one portable hash primitive).
  * Same tight codegen'd loop as the XXH64 variant; empty input yields
  * Long.MaxValue sentinels. */
final case class MinHashXorSignature(child: Expression, constants: Seq[Long])
  extends UnaryExpression {

  require(constants.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_xor_signature requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_xor_signature"

  private lazy val cs: Array[Long] = constants.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = cs.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = h ^ cs(j)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val csRef = ctx.addReferenceObj("mhXorConstants", cs, "long[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[${cs.length}];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int ${i}n = $c.numElements();
         |for (int $i = 0; $i < ${i}n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < ${cs.length}; $j++) {
         |    long $v = $h ^ $csRef[$j];
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashXorSignature =
    copy(child = newChild)
}

/** `simhash64(hashes)`: 64-bit SimHash — every bit of every input hash
  * votes ±1, the fingerprint packs the positive-sum bits. Single pass,
  * no allocation beyond the 64-slot accumulator. */
final case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $counts = new int[64];
         |int ${i}n = $c.numElements();
         |for (int $i = 0; $i < ${i}n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $counts[$j] += (((${h} >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Digest-to-long core of [[Md5Hash60]], shared by the interpreted and
  * codegen'd paths (the [[ColognePhoneticAlgo]] static-call pattern).
  * One thread-local MessageDigest — `getInstance` per row is what makes
  * Spark's own `md5()` spelling allocate, and the composed
  * `conv(substring(md5(s),1,15),16,10)` additionally hex-encodes 32
  * chars, substrings, and string-parses base-16 per row. This computes
  * the identical value straight off the digest bytes: the first 15 hex
  * chars are bytes 0–6 (14 nibbles) plus the high nibble of byte 7. */
object Md5Hash60Algo {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) >> 4) & 0xfL)
  }
}

/** `md5_hash60(s)`: the portable 60-bit hash — first 15 hex chars of
  * `md5(s)` as a bigint — as ONE codegen'd primitive call instead of the
  * 4-expression `conv(substring(md5(s),1,15),16,10)` composition (which
  * per row allocates the 32-char hex string, a substring copy, and
  * `conv`'s base-16 string parse). Bit-identical by construction
  * (HashExprSpec pins native ≡ composed on a property sweep), so every
  * DuckDB oracle spelling `CAST('0x'||SUBSTR(MD5(v),1,15) AS BIGINT)`
  * is untouched. This is the row-linear term of every portable-lane
  * sketch (KMV q17b/q159/q162, SimHash q31, MinHash q30, sampling
  * q131/q187) — the cost VERDICT r11 #7 flagged at sf1. */
final case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 requires string, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def nullSafeEval(input: Any): Any =
    Md5Hash60Algo.hash60(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Hash60Algo.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

/** `array_dot(a, b)`: dot product of two array<double> columns as one
  * primitive loop. The HOF spelling (`aggregate(zip_with(a, b, *), 0d, +)`)
  * evaluates its lambdas interpreted with boxing per element — the
  * dominant per-pair cost of every cosine scoring stage (brute-force /
  * IVF / LSH KNN, SemDeDup pairs). Fold order matches the HOF exactly
  * (((0+a0b0)+a1b1)+…), so results are bit-identical to the previous
  * path and to the DuckDB oracles built on it. Ragged inputs (never
  * produced by our pipelines) fold over the shorter length rather than
  * the HOF's null-poisoning. */
final case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires two array<double>, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $acc = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points. */
object HashFunctions {
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(hashes), numHashes))

  def minhashXorSignature(hashes: Column, constants: Seq[Long]): Column =
    Bridge.column(
      MinHashXorSignature(Bridge.expression(hashes), constants))

  /** Driver-side mirror of [[md5Hash60]] for deriving portable constants:
    * the first 15 hex chars of the md5 of the UTF-8 string, as a long —
    * identical to `CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT)`. */
  def md5Hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  def simhash64(hashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashes)))

  def arrayDot(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))

  def colognePhonetic(c: Column): Column =
    Bridge.column(ColognePhonetic(Bridge.expression(c)))

  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(
      JaroWinklerSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Spark's own runtime-filter bloom aggregate, exposed for EXPLICIT
    * semi-join pruning (the scale pattern when the dim side is too big
    * to broadcast but its key set fits a compact bitmap). `hashed` must
    * be an xxhash64 long on BOTH build and probe sides. */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(Bridge.expression(hashed),
          Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
  }

  def mightContain(bloom: Column, hashed: Column): Column =
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Bridge.expression(bloom), Bridge.expression(hashed)))

  /** Portable 60-bit hash: the first 15 hex chars of `md5(value as
    * string)` parsed as an unsigned integer — uniform in [0, 2^60) and
    * reproducible in ANY engine with md5 + hex parsing (DuckDB:
    * `CAST('0x' || SUBSTR(MD5(CAST(v AS VARCHAR)), 1, 15) AS BIGINT)`).
    * The q100/q112 md5-derivation discipline packaged as the hash
    * behind [[kmvDistinct]] and the portable SimHash oracle (q31);
    * NULL in → NULL out. */
  def md5Hash60(c: Column): Column =
    Bridge.column(Md5Hash60(Bridge.expression(c.cast("string"))))

  /** The 4-expression composed spelling [[md5Hash60]] replaced (r12) —
    * kept as the cross-implementation witness HashExprSpec pins the
    * native expression against. */
  def md5Hash60Composed(c: Column): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
  }

  /** Bottom-k (KMV) approximate COUNT(DISTINCT) over a pre-hashed long
    * column ([[md5Hash60]]) — deterministic, exact-integer estimate a
    * SQL engine reproduces verbatim (see [[KmvDistinctAgg]]). Relative
    * error ~1/√(k−2) once past k distinct values; exact below k. */
  def kmvDistinct(hashed: Column, k: Int = 1024): Column =
    Bridge.column(
      KmvDistinctAgg(Bridge.expression(hashed), k).toAggregateExpression())

  /** The bottom-k KMV buffer evaluated as its SAMPLE (k smallest
    * distinct hashes, ascending `array<bigint>`) instead of the
    * estimate — see [[KmvSampleAgg]]: set operations and the
    * exact-integer θ estimates then run as plain column arithmetic,
    * which is what makes the q162 theta-overlap row DuckDB-rebuildable. */
  def kmvSample(hashed: Column, k: Int = 1024): Column =
    Bridge.column(
      KmvSampleAgg(Bridge.expression(hashed), k).toAggregateExpression())

  /** The KMV hash domain 2^60 — [[md5Hash60]]'s output range. ONE
    * definition shared by every sample-side estimator spelling (the
    * SQL oracle strings necessarily repeat the literal — they must be
    * standalone DuckDB text). */
  val KmvDomain: Long = 1152921504606846976L

  /** θ cutoff of a [[kmvSample]] array: the k-th smallest hash when
    * the sample is full, the whole domain (2^60) below k — below k
    * every retained hash is "below θ" and the estimate is EXACT. */
  def kmvTheta(sample: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{element_at, lit, size, when}
    when(size(sample) < k, lit(KmvDomain)).otherwise(element_at(sample, k))
  }

  /** `|{h ∈ sample : h < θ}|` — samples arrive ascending and distinct,
    * so this is plain element counting (θ may be another sample's
    * cutoff: theta-sketch set operations evaluate every term at the
    * COMMON θ′ = min of the cutoffs). */
  def kmvBelow(sample: Column, theta: Column): Column = {
    import org.apache.spark.sql.functions.{filter, size}
    size(filter(sample, h => h < theta)).cast("long")
  }

  /** Exact-integer KMV/theta estimate `n·2^60 div θ` over NAMED
    * columns: the DECIMAL(38,0) product (≤ 26 digits at k ≤ 2^20)
    * through IntegralDivide → BIGINT. Collapses to the exact distinct
    * count below k (θ = 2^60) and to the (k−1)-convention KMV estimate
    * at k — the same arithmetic as [[KmvDistinctAgg.estimate]], kept in
    * lock-step by KmvSketchSpec's saturation pin. */
  def kmvEstimate(n: String, theta: String): Column = {
    import org.apache.spark.sql.functions.expr
    expr(s"cast($n as decimal(38,0)) * ${KmvDomain}L div $theta")
  }

  /** Spark's internal bounded-priority-queue collect, exposed for
    * explicit grouped top-k: ONE hash aggregate with a k-item heap per
    * group (map-side combinable) — no per-group sort, no window, no
    * one-reducer-per-group. `reverse = false` keeps the LARGEST k by
    * the child's type ordering (struct = lexicographic; negate a field
    * for a mixed direction), `true` the smallest. Result array arrives
    * ordered best-first. */
  def collectTopK(c: Column, k: Int, reverse: Boolean): Column =
    Bridge.collectTopK(c, k, reverse)
}
