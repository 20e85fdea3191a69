package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization encoder — the native kernel under
  * [[graft.ext.Similarity.pqEncode]]: for each of `m` contiguous
  * subspaces of the vector, the id-sorted POSITION of the squared-L2
  * nearest sub-centroid (strictly-smaller keeps the earlier position,
  * so ties break to the smaller centroid id). Bit-identical to the
  * higher-order-function spec form `pqEncodeHof` (asserted in
  * HashExpressionsSpec): distances accumulate in dimension order from
  * 0.0 with the identical subtract-square-add sequence, and the
  * strictly-less argmin mirrors the fold's `di < acc.d`.
  *
  * This is the hot loop of a 100 TB ingest pass (O(|centroids| · dim)
  * per row, every row of the corpus once), which is why it is a
  * compiled kernel rather than nested lambda dispatch — the same
  * reasoning as [[BpeTokenCount]] and [[SignSketchWide]]. The per-row
  * loop runs in [[compute]], referenced once from generated code,
  * inside whole-stage codegen.
  *
  * `right` is the id-sorted array of FULL-dimension centroid vectors
  * (array<array<double>>); the kernel slices subspaces itself. The
  * subspace width is `numElements / m` (integer division — `m` should
  * divide the dimension; a trailing remainder is ignored by BOTH this
  * kernel and the HOF form, identically). Null ELEMENTS inside a
  * vector read as 0.0 (primitive array storage); a null centroid
  * entry throws an attributable error rather than an opaque NPE.
  */
case class PqEncode(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {
  require(m >= 1, s"m must be >= 1, got $m")

  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isNumericArray(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float> or array<double> vector, " +
          s"got ${left.dataType.sql}")
    else right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<array<double>> centroids, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(vec: ArrayData, cents: ArrayData): ArrayData = {
    val d = vec.numElements()
    val sub = d / m
    val nc = cents.numElements()
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestP = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < nc) {
        if (cents.isNullAt(c)) throw new IllegalArgumentException(
          s"graft_pq_encode: centroid entry $c is NULL — the centroid " +
            "array must hold one non-null vector per entry")
        val cv = cents.getArray(c)
        var dist = 0.0
        var j = 0
        val base = s * sub
        while (j < sub) {
          val x = if (isFloat) vec.getFloat(base + j).toDouble
                  else vec.getDouble(base + j)
          val t = x - cv.getDouble(base + j)
          dist += t * t
          j += 1
        }
        if (dist < bestD) { bestD = dist; bestP = c }
        c += 1
      }
      codes(s) = bestP
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(
      "pqEncodeKernel", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** ADC score — the native kernel under the coarse pass of
  * [[graft.ext.Similarity.pqTopK]]: Σ over subspaces of
  * `lut[s][codes[s]]`, the per-query lookup-table read that turns a
  * PQ-coded corpus row into m array reads and adds. Folds in subspace
  * order from 0.0 — bit-identical to the HOF fold and the oracle's
  * `list_reduce(list_prepend(0.0, …))`. This runs once per
  * (corpus row × query) in the coarse pass, the hottest loop of the
  * PQ rung; the whole loop inlines into generated code (no lambda
  * dispatch, no per-element Catalyst `element_at` bounds machinery).
  *
  * A code outside the LUT's centroid range throws an attributable
  * error (it means codes and LUT came from different codebooks); a
  * code count different from the LUT's subspace count likewise.
  */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<int> codes, array<array<double>> lut), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  def compute(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    if (m != lut.numElements()) throw new IllegalArgumentException(
      s"graft_pq_adc: code count $m != LUT subspace count " +
        s"${lut.numElements()} — codes and LUT must share a codebook")
    var acc = 0.0
    var s = 0
    while (s < m) {
      val row = lut.getArray(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= row.numElements()) throw new IllegalArgumentException(
        s"graft_pq_adc: code $c out of range for ${row.numElements()} " +
          "centroids — codes and LUT must share a codebook")
      acc += row.getDouble(c)
      s += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(
      "pqAdcKernel", this, classOf[PqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
