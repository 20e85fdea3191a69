package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Deterministic structured random rotation `R = H·D/√d` — the
  * FAISS-style preprocessing between raw embeddings and product
  * quantization: `D` flips signs per dimension (deterministic md5
  * parity — no RNG state), `H` is the Walsh–Hadamard transform
  * (in-place butterfly, d·log d adds/subs), and the `1/√d` scale makes
  * `R` orthogonal, so norms and pairwise cosines are preserved to
  * float rounding while energy concentrated in a few correlated
  * dimensions SPREADS across all of them — exactly the anisotropy
  * that starves per-subspace PQ codebooks ([[graft.ext.Similarity
  * .pqCodebooks]] trains independent sub-codebooks; a subspace holding
  * all the variance eats the whole distortion budget). Rotate, train,
  * encode, and query in the rotated space; every downstream operator
  * is unchanged because cosine structure is invariant.
  *
  * Exactness: signs and butterfly run in DOUBLE in a FIXED order
  * (stage s pairs i with i⊕2ˢ, lower = a+b, upper = a−b), one final
  * multiply by `1/√d` (correctly rounded) and a cast per element back
  * to FLOAT — the oracle replays the identical stages in SQL and the
  * REAL cast rounds to the same bits. `dim` must be a power of two
  * (pad to the next power with zeros upstream — standard practice); a
  * vector of any other length throws (the [[graft.ext.Similarity
  * .lshBucket]] fail-fast doctrine). NULL → NULL. */
case class FwhtRotate(child: Expression, dim: Int, seed: Int)
    extends UnaryExpression {

  require(dim >= 2 && (dim & (dim - 1)) == 0,
    s"dim must be a power of two >= 2, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_fwht_rotate"

  /** ±1 per dimension: parity of the first md5 nibble of
    * "fwht_<seed>_<d>" — driver-computed constants, oracle-replayable
    * as a hex-digit parity check. */
  @transient private lazy val signs: Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { d =>
      val digest = md.digest(s"fwht_${seed}_$d".getBytes("UTF-8"))
      if (((digest(0) >> 4) & 0xF) % 2 == 0) 1.0 else -1.0
    }
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"graft_fwht_rotate: expected $dim-dim vector, got $n " +
          "(zero-pad to the power of two upstream)")
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = arr.getFloat(i).toDouble * signs(i); i += 1 }
    var step = 1
    while (step < n) {
      var base = 0
      while (base < n) {
        var j = base
        while (j < base + step) {
          val a = v(j); val b = v(j + step)
          v(j) = a + b
          v(j + step) = a - b
          j += 1
        }
        base += 2 * step
      }
      step *= 2
    }
    val s = 1.0 / math.sqrt(n.toDouble)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = (v(i) * s).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fwhtKernel", this,
      classOf[FwhtRotate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): FwhtRotate =
    copy(child = newChild)
}
