package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (DataSketches) — the SET-ALGEBRA leg of the mergeable
  * distinct-count state: HLL ([[graft.ops.Ops.aggregateStateHll]])
  * answers only |A ∪ B|, but audience/overlap questions — "how many
  * suppliers serve BOTH segments", "how many users did we LOSE" — need
  * |A ∩ B| and |A \ B|, which union-only sketches cannot express. A
  * theta sketch keeps (up to) the k smallest value hashes; unions,
  * intersections, and differences operate on those hash sets directly,
  * so every set expression over persisted per-group sketches costs a
  * |groups|-sized projection — history is never re-read.
  *
  * Exactness contract (the oracle's regime, same shape as the HLL
  * coupon list and the KLL ≤k buffer): while a sketch has seen fewer
  * than its nominal-entries capacity it retains EVERY distinct hash
  * with θ = 1 — estimates are exact counts, set operations are exact
  * set arithmetic, and everything is deterministic (the default murmur
  * seed is fixed). Beyond capacity the published relative-error band
  * applies (~1/√k); intersections of barely-overlapping large sets
  * carry the well-known wider band. NULL values are skipped; a group of
  * only NULLs yields an empty sketch (estimate 0).
  *
  * Value hashing: LONG columns hash their 8 bytes, STRING columns their
  * UTF-8 bytes (`update(byte[])` on the exact bytes — NOT
  * `update(String)`, which would hash a UTF-16 transform and make the
  * sketch depend on JVM string internals). Cast other types explicitly
  * to pick which identity you mean.
  */
object ThetaSketch {
  def requireNominal(n: Int): Unit = require(
    n >= 16 && n <= (1 << 26) && Integer.bitCount(n) == 1,
    s"nominalEntries must be a power of two in [16, 2^26], got $n")

  private[functions] def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(bytes))
}

/** Aggregate a LONG or STRING column into a serialized compact theta
  * sketch (BINARY). Map-side partial sketches union on the reduce side
  * — the classic algebraic-aggregate shape. */
case class ThetaSketchAgg(
    child: Expression,
    nominalEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  ThetaSketch.requireNominal(nominalEntries)

  override def prettyName: String = "graft_theta_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT or STRING value column " +
        s"(cast explicitly), got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // lazy: children may be unresolved when Catalyst copies the node
  @transient private lazy val isLong = child.dataType == LongType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      if (isLong) buffer.update(v.asInstanceOf[Long])
      else buffer.update(v.asInstanceOf[UTF8String].getBytes)
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): ThetaSketchAgg = copy(child = newChild)
}

/** Fold a column of serialized theta sketches into one union — the
  * maintenance merge. NULL entries are skipped. */
case class ThetaUnionAgg(
    child: Expression,
    nominalEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  ThetaSketch.requireNominal(nominalEntries)

  override def prettyName: String = "graft_theta_union"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BINARY serialized theta sketch, " +
        s"got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(ThetaSketch.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): ThetaUnionAgg = copy(child = newChild)
}

/** Rounded distinct estimate of a serialized theta sketch (BIGINT).
  * Exact in the pre-capacity regime. `CodegenFallback` by design: runs
  * on |groups|-sized state frames, never the corpus. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_theta_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BINARY serialized theta sketch, " +
        s"got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    math.rint(ThetaSketch.wrap(input.asInstanceOf[Array[Byte]]).getEstimate)
      .toLong

  override protected def withNewChildInternal(
      newChild: Expression): ThetaEstimate = copy(child = newChild)
}

/** Rounded estimate of a binary set operation over two serialized theta
  * sketches: `intersect` → |A ∩ B|, `diff` → |A \ B|. The set algebra
  * HLL structurally lacks. */
case class ThetaSetOpEstimate(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {

  require(op == "intersect" || op == "diff",
    s"op must be 'intersect' or 'diff', got '$op'")

  override def prettyName: String = s"graft_theta_$op"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two BINARY serialized theta sketches, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaSketch.wrap(a.asInstanceOf[Array[Byte]])
    val sb = ThetaSketch.wrap(b.asInstanceOf[Array[Byte]])
    val result =
      if (op == "intersect")
        SetOperation.builder().buildIntersection().intersect(sa, sb)
      else SetOperation.builder().buildANotB().aNotB(sa, sb)
    math.rint(result.getEstimate).toLong
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOpEstimate =
    copy(left = newLeft, right = newRight)
}
