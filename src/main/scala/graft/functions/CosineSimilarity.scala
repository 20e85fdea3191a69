package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
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
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: Seq[ArrayType] <: Seq[AbstractDataType]
  // (AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  // NULL on length mismatch even for non-null inputs
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val sna = math.sqrt(na)
    val snb = math.sqrt(nb)
    if (sna == 0.0 || snb == 0.0) 0.0 else dot / (sna * snb)
  }

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
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = (double) $x.getFloat($i);
         |    final double $yi = (double) $y.getFloat($i);
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
