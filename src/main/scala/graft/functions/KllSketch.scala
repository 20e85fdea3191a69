package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketches (Karnin–Lang–Liberty, the DataSketches
  * implementation Spark already ships for its own HLL functions) as the
  * QUANTILE leg of the mergeable aggregate state family
  * ([[graft.ops.Ops.aggregateState]] holds the additive measures,
  * `aggregateStateHll` the distinct counts — exact per-group
  * percentiles have NO bounded mergeable state: the state is the value
  * multiset itself).
  *
  * A KLL doubles sketch at `k = 200` holds ≈ 2.4 KB per (group, field)
  * FOREVER and answers any rank query within a ~1.65% normalized-rank
  * error band. Crucially for the maintenance contract, while the
  * sketch has seen ≤ `k` values it has never compacted: it is a plain
  * sorted buffer of ALL values, quantile queries return EXACT order
  * statistics, and merging two exact-regime sketches is exact — the
  * regime the oracle asserts (the HLL coupon-list precedent,
  * `Ops.aggregateStateHll`). Beyond `k` values compaction begins, and
  * — unlike HLL — the DataSketches compactor flips a random coin per
  * compaction, so estimation-regime results are NOT rerun-identical;
  * they stay inside the published rank-error band (spec-pinned) but
  * cannot be hash-compared. Queries that need exact reproducible
  * percentiles at any scale remain on `Ops.percentileAgg`.
  *
  * Inputs: NULL and NaN values are skipped (NaN has no rank; the
  * isnan-guard doctrine of the sign-sketch oracles). A group whose
  * values are all NULL/NaN yields an EMPTY sketch, and every quantile
  * of an empty sketch is NULL.
  */
object KllSketch {
  /** datasketches bounds: k ∈ [8, 65535]. */
  def requireK(k: Int): Unit = require(k >= 8 && k <= 65535,
    s"KLL k must be in [8, 65535], got $k")

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Aggregate a DOUBLE column into a serialized KLL doubles sketch
  * (BINARY). The map side builds per-partition sketches and the merge
  * is sketch-merge — a classic algebraic aggregate, so 100 TB of rows
  * reduce to one ~2.4 KB state per group with map-side partials. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  KllSketch.requireK(k)

  override def prettyName: String = "graft_kll_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a DOUBLE value column (cast explicitly), " +
        s"got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buffer.update(d)
    }
    buffer
  }

  override def merge(
      buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KllSketchAgg = copy(child = newChild)
}

/** Fold a column of serialized KLL sketches into one — the maintenance
  * merge: stored state rows and a batch's state rows union and each
  * group's sketches merge pairwise. NULL sketch entries are skipped
  * (the NULL-merge-entry guard doctrine). */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  KllSketch.requireK(k)

  override def prettyName: String = "graft_kll_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BINARY serialized KLL sketch, " +
        s"got ${child.dataType.sql}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(KllSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(
      buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KllMergeAgg = copy(child = newChild)
}

/** Quantile query against a serialized KLL sketch: the value whose
  * INCLUSIVE normalized rank first reaches `rank` — in the exact
  * (never-compacted) regime, precisely the 1-indexed order statistic
  * at position ⌈rank·n⌉. NULL sketch or empty sketch → NULL; rank must
  * be in [0, 1] (rank 0 = minimum, 1 = maximum).
  *
  * Deliberately `CodegenFallback`: this projects a |groups|-sized state
  * frame (one heapify + one binary search per GROUP, not per corpus
  * row) — never the hot path. */
case class KllSketchQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BINARY serialized KLL sketch, " +
          s"got ${left.dataType.sql}")
    else if (right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a DOUBLE rank in [0, 1], " +
          s"got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(sketch: Any, rank: Any): Any = {
    val r = rank.asInstanceOf[Double]
    require(r >= 0.0 && r <= 1.0, s"$prettyName rank must be in [0, 1], got $r")
    val sk = KllSketch.heapify(sketch.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllSketchQuantile =
    copy(left = newLeft, right = newRight)
}
