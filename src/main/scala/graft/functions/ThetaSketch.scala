package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable Theta sketches (Apache DataSketches) — the SET-OPERATION
  * member of the sketch lane next to HLL (distinct counts) and KLL
  * (quantiles): Theta sketches support INTERSECTION and difference
  * estimates, which HLL cannot. The 100 TB pattern: one sketch per
  * source/segment partial, persisted; any cross-segment overlap /
  * Jaccard estimate is then a driver-side set operation over kilobyte
  * sketches — the corpora are never re-scanned, never joined.
  *
  * The aggregation buffer is a theta `Union` (accepts raw updates AND
  * sketch merges), serialized only at shuffle boundaries — the
  * [[KllSketchAgg]] / Spark-hll discipline.
  *
  * Reference evidence: exasol/etl-utils `query_wrapper.sql:40` forwards
  * set SQL to the host engine; this is the sketch-side scale analog. */
final case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires bigint or string, got ${other.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  private def newUnion: Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion

  override def update(buf: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case LongType => buf.update(v.asInstanceOf[Long])
      case _ => buf.update(v.toString)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Union-aggregate over ALREADY-SERIALIZED theta sketches. */
final case class ThetaMergeAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_merge_agg requires binary, got ${other.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_merge_agg"

  private def newUnion: Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion

  override def update(buf: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null)
      buf.union(Sketches.heapifyCompactSketch(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ThetaMergeAgg =
    copy(child = newChild)
}

/** Static eval targets for the theta scalar expressions' codegen. */
object ThetaAlgo {
  def estimate(bytes: Array[Byte]): Double =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes)).getEstimate

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val in = SetOperation.builder().buildIntersection()
    in.intersect(Sketches.heapifyCompactSketch(Memory.wrap(a)))
    in.intersect(Sketches.heapifyCompactSketch(Memory.wrap(b)))
    in.getResult.getEstimate
  }
}

/** `theta_estimate(sketch)` → double: distinct estimate of a serialized
  * theta sketch. */
final case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires binary, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def nullSafeEval(input: Any): Any =
    ThetaAlgo.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ThetaAlgo.estimate($c)")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect_estimate(a, b)` → double: estimated size of the
  * intersection of two serialized theta sketches — the operation HLL
  * cannot do. Runs on post-aggregate rows (segment pairs), never facts. */
final case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_estimate requires two binary, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaAlgo.intersectEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaAlgo.intersectEstimate($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}
