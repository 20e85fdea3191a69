package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the 64-bit sign sketch of an
  * embedding (bit d set iff `vec[d] >= 0`, d < dim) — the per-row hot
  * loop of [[graft.ext.Similarity.hammingTopK]]'s corpus pass, lowered
  * from the higher-order-function fold
  * ([[graft.ext.Similarity.signSketchHof]]) to one whole-stage-codegen
  * loop: no per-element lambda dispatch, no intermediate sequence
  * array, one pass OR-ing shifted bits.
  *
  * The sign test is IEEE `>= 0` — `-0.0` sets the bit, NaN does NOT —
  * which is DELIBERATELY not Spark SQL's total-order float comparison
  * (NaN above everything, -0.0 below 0.0): the sketch is an index
  * artifact shared with external engines, and IEEE `>=` is the
  * portable primitive-comparison semantics. NOTE that DuckDB's `>=`
  * is itself total-order for NaN (NaN ranks above all values, so
  * `NaN >= 0` is TRUE there) — the DuckDB oracle therefore guards its
  * sign test with an explicit `NOT isnan(x)` conjunct to match this
  * kernel bit-for-bit on NaN inputs. The HOF
  * spec form ([[graft.ext.Similarity.signSketchHof]]) encodes the same
  * IEEE semantics explicitly and is asserted bit-identical. Dimensions
  * past the array's length contribute 0, so the loop bound is
  * `min(dim, length)`. Accepts `array<float>` and `array<double>`.
  */
case class SignSketch64(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1 && dim <= 64, s"sketch packs 1..64 dims, got $dim")

  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<float> or array<double> input, " +
        s"got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_sketch"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(x: ArrayData): Long = {
    val n = math.min(dim, x.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      if (xi >= 0.0) s |= (1L << i)
      i += 1
    }
    s
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val xGet =
        if (isFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($dim, $x.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xGet >= 0.0) $s |= (1L << $i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignSketch64 = copy(child = newChild)
}
