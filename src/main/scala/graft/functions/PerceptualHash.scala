package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 60-bit perceptual hash of a blob — the native kernel under
  * [[graft.ext.BinaryOps.aHash60]] / `dHash60`: 61 stride-sampled
  * unsigned byte values (sample k reads byte ⌊k·n/61⌋), packed by
  * either the aHash mean test (`dHash = false`: bit k set iff
  * `sample(k)·60 ≥ Σ samples 0..59` — integer-exact, no division) or
  * the dHash gradient test (`dHash = true`: bit k set iff
  * `sample(k+1) > sample(k)`). Empty blob → 0; NULL → NULL. Top four
  * bits always clear (60-bit budget), so downstream shift/compare
  * arithmetic is exact BIGINT in both engines.
  *
  * Bit-identical to the higher-order-function spec forms
  * (`aHash60Hof`/`dHash60Hof`, asserted in HashExpressionsSpec over
  * arbitrary bytes) — but where the HOF form pays substring + hex +
  * base-conversion STRING machinery per sampled byte (61 of them,
  * per row, interpreted), this kernel is one primitive byte loop
  * inside whole-stage codegen. It runs once per blob in every
  * perceptual-dedup scan — the ingest hot loop of the multimodal
  * near-dup family. Sample positions use long multiplication, so
  * multi-gigabyte blobs index correctly.
  */
case class PerceptualHash60(child: Expression, dHash: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (dHash) "graft_dhash60" else "graft_ahash60"

  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val ss = new Array[Long](61)
    var k = 0
    while (k <= 60) {
      ss(k) = bytes(((k.toLong * n) / 61).toInt) & 0xFFL
      k += 1
    }
    var h = 0L
    var i = 0
    if (dHash) {
      while (i < 60) {
        if (ss(i + 1) > ss(i)) h |= 1L << i
        i += 1
      }
    } else {
      var total = 0L
      while (i < 60) { total += ss(i); i += 1 }
      i = 0
      while (i < 60) {
        if (ss(i) * 60 >= total) h |= 1L << i
        i += 1
      }
    }
    h
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(
      "phashKernel", this, classOf[PerceptualHash60].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $self.compute($x);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PerceptualHash60 = copy(child = newChild)
}
