package graft.functions

import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Apache DataSketches KLL, Karnin–Lang–
  * Liberty 2016) — the quantile sibling of the HLL distinct lane: one
  * byte-bounded sketch per partition/day partial, merged per segment
  * WITHOUT rescanning history, quantiles extracted from the merged
  * state. `TypedImperativeAggregate` is the native Catalyst shape for
  * sketch buffers (Spark's own HLL agg uses it): the live sketch object
  * is the aggregation buffer, serialized only at shuffle boundaries —
  * no per-row (de)serialization, map-side combine for free.
  *
  * Reference evidence: exasol/etl-utils `query_wrapper.sql:40` forwards
  * percentile SQL to the host engine; this is the scale-path analog for
  * incremental percentile maintenance. */
final case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllFloatsSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires double, got ${other.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllFloatsSketch =
    KllFloatsSketch.newHeapInstance(k)

  override def update(buf: KllFloatsSketch, row: InternalRow): KllFloatsSketch = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Double].toFloat)
    buf
  }

  override def merge(buf: KllFloatsSketch, other: KllFloatsSketch): KllFloatsSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllFloatsSketch): Any = buf.toByteArray

  override def serialize(buf: KllFloatsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union-aggregate over ALREADY-SERIALIZED KLL sketches (binary
  * column) — the rollup step over persisted partials. */
final case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllFloatsSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires binary, got ${other.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllFloatsSketch =
    KllFloatsSketch.newHeapInstance(k)

  override def update(buf: KllFloatsSketch, row: InternalRow): KllFloatsSketch = {
    val v = child.eval(row)
    if (v != null)
      buf.merge(KllFloatsSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllFloatsSketch, other: KllFloatsSketch): KllFloatsSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllFloatsSketch): Any = buf.toByteArray

  override def serialize(buf: KllFloatsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Static eval target for [[KllQuantile]]'s codegen. */
object KllQuantileAlgo {
  /** An EMPTY sketch (an all-NULL group still aggregates to serialized
    * empty-sketch bytes — the agg itself is non-nullable) has no
    * quantiles; DataSketches would throw at runtime, so return NaN
    * instead, the IEEE "no value" a double column can carry (r9
    * ADVICE). */
  def quantile(bytes: Array[Byte], rank: Double): Double = {
    val sk = KllFloatsSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE).toDouble
  }
}

/** `kll_quantile(sketch, rank)` → double: the rank-`rank` quantile of a
  * serialized KLL sketch (INCLUSIVE criterion, the DataSketches
  * default). Runs on post-aggregate rows (one per segment), never the
  * fact table. */
final case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (binary, double), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sk: Any, p: Any): Any =
    KllQuantileAlgo.quantile(
      sk.asInstanceOf[Array[Byte]], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.KllQuantileAlgo.quantile($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the sketch lane. */
object SketchFunctions {
  /** Default k=200: ~1.65% normalized rank error, ~5 KB sketches. */
  def kllAgg(c: Column, k: Int = 200): Column =
    Bridge.column(
      KllSketchAgg(Bridge.expression(c), k).toAggregateExpression())

  def kllMerge(c: Column, k: Int = 200): Column =
    Bridge.column(
      KllMergeAgg(Bridge.expression(c), k).toAggregateExpression())

  def kllQuantile(sketch: Column, rank: Column): Column =
    Bridge.column(
      KllQuantile(Bridge.expression(sketch), Bridge.expression(rank)))

  /** Default α=0.005: ≤0.5% relative error per quantile, deterministic
    * (merge = bucket addition — see [[graft.functions.LogHist]]). */
  def logHistAgg(c: Column, alpha: Double = 0.005): Column =
    Bridge.column(
      LogHistAgg(Bridge.expression(c), alpha).toAggregateExpression())

  def logHistMerge(c: Column, alpha: Double = 0.005): Column =
    Bridge.column(
      LogHistMergeAgg(Bridge.expression(c), alpha).toAggregateExpression())

  def logHistQuantile(sketch: Column, rank: Column): Column =
    Bridge.column(
      LogHistQuantile(Bridge.expression(sketch), Bridge.expression(rank)))

  /** Default lgK=12: 4096 nominal entries — EXACT below that, ~1.6%
    * relative error above. */
  def thetaAgg(c: Column, lgK: Int = 12): Column =
    Bridge.column(
      ThetaSketchAgg(Bridge.expression(c), lgK).toAggregateExpression())

  def thetaMerge(c: Column, lgK: Int = 12): Column =
    Bridge.column(
      ThetaMergeAgg(Bridge.expression(c), lgK).toAggregateExpression())

  def thetaEstimate(c: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(c)))

  def thetaIntersectEstimate(a: Column, b: Column): Column =
    Bridge.column(
      ThetaIntersectEstimate(Bridge.expression(a), Bridge.expression(b)))
}
