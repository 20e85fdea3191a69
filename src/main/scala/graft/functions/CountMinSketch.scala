package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{CountMinSketch => SparkCms}

/** Count–min sketches (Cormode–Muthukrishnan; Spark's own
  * `org.apache.spark.util.sketch.CountMinSketch`, the engine behind
  * `DataFrameStatFunctions.countMinSketch`) — the POINT-FREQUENCY leg
  * of the mergeable aggregate state family: the additive measures
  * ([[graft.ops.Ops.aggregateState]]), distinct counts (HLL/theta), and
  * quantiles (KLL) all answer "how much / how many", but "how OFTEN
  * does THIS value occur" over an unbounded key domain has no bounded
  * exact state — the exact answer is the full frequency map. A CMS is a
  * depth×width counter matrix: each value increments one counter per
  * row (row-seeded Murmur3), a point query reads the MINIMUM of its
  * depth counters, and merging is element-wise addition — a classic
  * algebraic aggregate, so 100 TB of rows reduce to one
  * depth·width·8-byte state per group with map-side partials, and the
  * persisted state answers frequency probes over history that is never
  * re-read. Complements [[graft.ext.Frequency]]'s exact two-pass heavy
  * hitters: Misra–Gries finds WHICH keys are heavy in one batch; the
  * CMS state answers "how often is key k" across all folded batches
  * without knowing k at build time.
  *
  * Exactness contract (the oracle's regime, same doctrine as the HLL
  * coupon list / theta pre-capacity / KLL ≤k buffer): estimates NEVER
  * undercount, and a point query is EXACT unless the key collides with
  * some other ingested key in ALL `depth` rows. With d distinct keys in
  * a sketch, a given query key collides in one row with probability
  * ≤ d/width, in all rows ≤ (d/width)^depth — at the default 5×4096
  * and the fixtures' ≤ hundreds of keys per group, structurally zero,
  * and (fixed Murmur3 row seeds) DETERMINISTIC either way: the oracle
  * either always matches or never does, and the estimation-regime spec
  * pins the one-sided band instead. NULL values are skipped; a group of
  * only NULLs yields an all-zero sketch (every estimate 0). Absent keys
  * estimate 0 in the collision-free regime.
  *
  * Value identity: LONG columns hash their integral value, STRING
  * columns their UTF-8 bytes (the byte-path `addBinary`, which Spark's
  * `addString` delegates to — NOT a UTF-16 transform; the
  * [[ThetaSketch]] identity doctrine). Point queries use the same
  * identity, so string and long keys never alias. All sketches that
  * merge must share (depth, width, seed) — Spark's `mergeInPlace`
  * rejects incompatible shapes and this surface pins them as
  * constructor parameters.
  */
object CountMinSketchFns {
  def requireShape(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 64,
      s"CMS depth must be in [1, 64], got $depth")
    require(width >= 1 && width <= (1 << 26),
      s"CMS width must be in [1, 2^26], got $width")
  }

  private[functions] def read(bytes: Array[Byte]): SparkCms =
    SparkCms.readFrom(bytes)

  // mergeInPlace throws IncompatibleMergeException on (depth, width,
  // seed) mismatch — the loud failure a shape-drifted stored state
  // deserves; never swallowed here
  private[functions] def mergeInto(
      buffer: SparkCms, other: SparkCms): SparkCms = {
    buffer.mergeInPlace(other)
    buffer
  }
}

/** Aggregate a LONG or STRING column into a serialized count–min sketch
  * (BINARY): one depth×width counter matrix per group, map-side
  * partials, element-wise-additive merge. */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SparkCms] with UnaryLike[Expression] {

  CountMinSketchFns.requireShape(depth, width)

  override def prettyName: String = "graft_cms_agg"
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

  override def createAggregationBuffer(): SparkCms =
    SparkCms.create(depth, width, seed)

  override def update(buffer: SparkCms, input: InternalRow): SparkCms = {
    val v = child.eval(input)
    if (v != null) {
      if (isLong) buffer.addLong(v.asInstanceOf[Long])
      else buffer.addBinary(v.asInstanceOf[UTF8String].getBytes)
    }
    buffer
  }

  override def merge(buffer: SparkCms, other: SparkCms): SparkCms =
    CountMinSketchFns.mergeInto(buffer, other)

  override def eval(buffer: SparkCms): Any = buffer.toByteArray

  override def serialize(buffer: SparkCms): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): SparkCms =
    CountMinSketchFns.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): CmsAgg = copy(child = newChild)
}

/** Fold a column of serialized count–min sketches into one — the
  * maintenance merge (stored state rows ∪ batch state rows, counters
  * add element-wise). NULL entries are skipped. */
case class CmsMergeAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SparkCms] with UnaryLike[Expression] {

  CountMinSketchFns.requireShape(depth, width)

  override def prettyName: String = "graft_cms_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BINARY serialized count-min sketch, " +
        s"got ${child.dataType.sql}")

  override def createAggregationBuffer(): SparkCms =
    SparkCms.create(depth, width, seed)

  override def update(buffer: SparkCms, input: InternalRow): SparkCms = {
    val v = child.eval(input)
    if (v != null)
      CountMinSketchFns.mergeInto(
        buffer, CountMinSketchFns.read(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: SparkCms, other: SparkCms): SparkCms =
    CountMinSketchFns.mergeInto(buffer, other)

  override def eval(buffer: SparkCms): Any = buffer.toByteArray

  override def serialize(buffer: SparkCms): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): SparkCms =
    CountMinSketchFns.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): CmsMergeAgg = copy(child = newChild)
}

/** Point-frequency query against a serialized count–min sketch: the
  * minimum of the key's `depth` counters — exact in the collision-free
  * regime, a never-undercounting estimate beyond. The key column must
  * be BIGINT or STRING and uses the same value identity the sketch was
  * built with (long integral / UTF-8 bytes). NULL sketch or NULL key →
  * NULL.
  *
  * Deliberately `CodegenFallback`: this projects a |groups|×|probes|
  * frame (one deserialize + depth array reads per probe, not per
  * corpus row) — never the hot path. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BINARY serialized count-min sketch, " +
          s"got ${left.dataType.sql}")
    else if (right.dataType != LongType && right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BIGINT or STRING probe key " +
          s"(cast explicitly), got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val sk = CountMinSketchFns.read(sketch.asInstanceOf[Array[Byte]])
    key match {
      case l: java.lang.Long => sk.estimateCount(l)
      case s: UTF8String     => sk.estimateCount(s.getBytes)
      case other             => sk.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
