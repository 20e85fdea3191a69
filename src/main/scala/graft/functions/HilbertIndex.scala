package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 2-D Hilbert-curve index — the
  * better-locality sibling of the Morton key
  * ([[graft.sources.ParquetStore.zValue]]): the Z-curve takes a
  * full-diagonal jump whenever a high interleaved bit flips, so a run
  * of consecutive Z values can span a wide rectangle; the Hilbert walk
  * visits EVERY consecutive cell pair at Manhattan distance exactly 1
  * (spec-pinned exhaustively on the 8×8 grid), so equal-count file
  * cuts cover tighter rectangles and parquet min/max stats prune
  * harder on both keys.
  *
  * The classic per-level fold (quadrant digit `d += s²·((3·rx)⊕ry)`
  * then reflect-about-(n−1)-and-swap), as an ITERATIVE loop in both
  * the interpreted and generated paths — a Column-level unrolling
  * duplicates (x, y) per level and the expression tree grows 2^bits
  * (measured: codegen OOM at bits = 6), which is exactly why this is
  * a native kernel and not a `when` chain. Inputs are LONG (cast
  * explicitly), taken modulo 2^bits; NULL in → NULL out. Both paths
  * share one static `compute`, asserted equal in the spec.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && 2 * bits <= 62,
    s"2 x bits ($bits) must fit a signed long")

  override def prettyName: String = "graft_hilbert_index"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two BIGINT keys (cast explicitly), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex.compute(
      xv.asInstanceOf[Long], yv.asInstanceOf[Long], bits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val m = HilbertIndex.getClass.getName.stripSuffix("$")
      s"${ev.value} = $m.compute($xv, $yv, $bits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** xy → d on the 2^bits × 2^bits grid. Static so the generated code
    * calls the same bytes the interpreted path runs. */
  def compute(xIn: Long, yIn: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // reflect about n-1 when entering the mirrored quadrants, then
      // swap axes — the rotation stitching quadrant curves end-to-end
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
