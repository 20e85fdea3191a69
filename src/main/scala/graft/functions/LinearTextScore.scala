package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Sufficient statistics for a LINEAR n-gram text classifier — the
  * fastText/CCNet-shaped model-based quality filter: a trained,
  * integer-quantized weight per word n-gram, a document scored by the
  * mean weight of its gram stream. This kernel emits the integer half,
  * `struct(w_sum BIGINT, n_grams INT)`: over every n-gram occurrence
  * (NON-distinct — each window votes once per occurrence, orders
  * 1..`maxN`), `w_sum` = Σ weight(gram) with absent grams weighing 0,
  * `n_grams` = the total window count. The presentation score
  * `bias + w_sum / n_grams` and the threshold verdict stay in plain
  * column space ([[graft.ext.TextOps.linearTextScore]]) — integers
  * until ONE final division, so the fold is order-independent and the
  * oracle replays it bit-for-bit.
  *
  * The model rides IN the expression like [[BpeTokenCount]]'s merge
  * table: a transient hash map built once per task from the serialized
  * weight list, broadcast with the plan — per-window cost is one map
  * probe however large the vocabulary, and nothing about the model
  * enters codegen'd literal space (a 100k-entry quantized model is a
  * few MB of plan payload, not a few MB of generated Java).
  *
  * Null array → null struct; null tokens inside the array weigh as the
  * empty string (the [[ShingleStrings]] discipline). Weight grams
  * wider than `maxN` tokens can never match a window and are rejected
  * at construction with an attributable error.
  */
case class LinearTextScore(
    child: Expression, weights: Seq[(String, Long)], maxN: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(maxN >= 1 && maxN <= 4, s"maxN must be in [1, 4], got $maxN")
  require(weights.nonEmpty, "the weight table must not be empty")
  weights.foreach { case (g, _) =>
    require(g.nonEmpty && g.split(" ", -1).length <= maxN,
      s"weight gram '$g' is wider than maxN=$maxN tokens (or empty) — " +
        "it could never match a window")
  }
  require(weights.map(_._1).distinct.length == weights.length,
    "duplicate grams in the weight table")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("w_sum", LongType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false)))
  override def prettyName: String = "graft_linear_text_score"

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](weights.size * 2)
    weights.foreach { case (g, w) =>
      m.put(UTF8String.fromString(g), java.lang.Long.valueOf(w))
    }
    m
  }

  @transient private lazy val space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData): InternalRow = {
    val m = tokens.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) =
        if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8
        else tokens.getUTF8String(i)
      i += 1
    }
    var sum = 0L
    var count = 0
    var n = 1
    while (n <= maxN) {
      var pos = 0
      while (pos <= m - n) {
        val gram =
          if (n == 1) toks(pos)
          else {
            val window = new Array[UTF8String](n)
            System.arraycopy(toks, pos, window, 0, n)
            UTF8String.concatWs(space, window: _*)
          }
        val w = table.get(gram)
        if (w ne null) sum += w.longValue()
        count += 1
        pos += 1
      }
      n += 1
    }
    InternalRow(sum, count)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("linearScoreKernel", this,
      classOf[LinearTextScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LinearTextScore =
    copy(child = newChild)
}
