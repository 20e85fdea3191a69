package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — the hot scalar of every similarity/dedup
  * query, lowered from the higher-order-function form
  * ([[graft.ext.Similarity.cosine]]) to a single whole-stage-codegen
  * loop: no per-element lambda dispatch, no intermediate zipped array,
  * one pass accumulating dot product and both norms.
  *
  * Semantics are bit-identical to the HOF form and the DuckDB oracle:
  * elements widen to double, accumulation is sequential in index order,
  * `dot / (sqrt(na) * sqrt(nb))`, and 0.0 when either norm is zero.
  * Mismatched lengths yield NULL (the HOF form nulls out via zip_with);
  * inputs with NULL elements are not supported (fixture embeddings are
  * dense).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // accepts array<float> AND array<double> — a fixed float-only
  // signature would reject double embeddings the HOF form handled (an
  // implicit cast double->float would silently lose precision instead)
  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(left.dataType) && isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  // NULL on length mismatch even for non-null inputs
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(x: ArrayData, y: ArrayData): Any = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val sna = math.sqrt(na)
    val snb = math.sqrt(nb)
    if (sna == 0.0 || snb == 0.0) 0.0 else dot / (sna * snb)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val sna = ctx.freshName("sna")
      val snb = ctx.freshName("snb")
      // element accessors specialize on the input types at codegen time
      val xGet = if (leftIsFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val yGet = if (rightIsFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = $xGet;
         |    final double $yi = $yGet;
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  final double $sna = Math.sqrt($na);
         |  final double $snb = Math.sqrt($nb);
         |  ${ev.value} = ($sna == 0.0 || $snb == 0.0) ? 0.0 : $dot / ($sna * $snb);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
