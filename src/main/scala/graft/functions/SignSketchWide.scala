package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, IntegerType}

/** Multi-word sign sketch of an embedding — the dim > 64
  * generalization of [[SignSketch64]]: ⌈dim/64⌉ BIGINT words, where
  * word w's bit j is the sign bit of element w·64 + j. A 1024-dim
  * float32 vector compresses to 16 longs (128 B, 32× less IO), which
  * is what makes the Hamming coarse pass of
  * [[graft.ext.Similarity.hammingTopKWide]] viable on real
  * 256-4096-dim text embeddings, not just the 64-dim fixture.
  *
  * Sign semantics are IDENTICAL to [[SignSketch64]] (IEEE `>= 0`:
  * -0.0 sets the bit, NaN does not — see that kernel's scaladoc for
  * the total-order / oracle discussion), and for dim ≤ 64 the single
  * word equals [[SignSketch64]]'s output bit-for-bit (spec-pinned).
  * Dimensions past the array's length contribute 0 bits, but the word
  * COUNT is always ⌈dim/64⌉ — sketches of a given dim are
  * fixed-length, so Hamming distances never see a length mismatch.
  *
  * The per-row loop runs in [[compute]] (a compiled JVM method
  * referenced once from generated code — array-returning expressions
  * don't inline profitably), inside whole-stage codegen.
  */
case class SignSketchWide(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<float> or array<double> input, " +
        s"got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_sketch_wide"

  private val nWords = (dim + 63) >>> 6

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(x: ArrayData): ArrayData = {
    val words = new Array[Long](nWords)
    val n = math.min(dim, x.numElements())
    var i = 0
    while (i < n) {
      val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      if (xi >= 0.0) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(
      "sketchKernel", this, classOf[SignSketchWide].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $self.compute($x);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignSketchWide = copy(child = newChild)
}

/** Hamming distance between two multi-word sign sketches
  * ([[SignSketchWide]]): the summed per-word popcount of XOR — the
  * dim > 64 generalization of `bit_count(a ^ b)` on single longs.
  * Pure integer bit arithmetic, exact cross-engine; the whole loop
  * inlines into whole-stage codegen (no lambda dispatch — this runs
  * once per (query, candidate) pair in the ANN coarse pass, the
  * hottest loop of the ladder).
  *
  * Word counts must match: sketches of different dims have no
  * meaningful distance, and a silent min-length zip would report
  * spuriously small distances — the mismatch throws with both
  * lengths named.
  */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming_words"

  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"graft_hamming_words: sketch word counts differ " +
        s"(${n} vs ${b.numElements()}) — distances across different " +
        "sketch dims are meaningless")
    var h = 0
    var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    h
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_hamming_words: sketch word counts differ (" + $n +
         |    " vs " + $b.numElements() + ") — distances across " +
         |    "different sketch dims are meaningless");
         |}
         |int $h = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingWords =
    copy(left = newLeft, right = newRight)
}
