package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** DEFLATE-compressed size of a blob — the primitive under the
  * compression-ratio quality signal (RedPajama-v2 / Dolma's
  * `compression_ratio`): natural text compresses to a characteristic
  * band, while boilerplate/template spam compresses far tighter and
  * high-entropy noise barely at all, so the ratio separates both
  * failure modes from prose with ONE number and no model.
  *
  * Raw DEFLATE (RFC 1951, `nowrap` — no zlib header) at a fixed
  * `level`, so the size is a pure function of the bytes: deterministic
  * across runs and partitionings for a fixed JDK (the JDK's inflater/
  * deflater implementation pins the encoder choices). NOT
  * cross-engine-reproducible — DuckDB exposes no deflate — so
  * consumers of this signal stay on the rows-only/spec side of the
  * correctness gate, like the CDC rolling hash.
  *
  * Compression state is per-THREAD (`ThreadLocal` Deflater + scratch
  * buffer, reset per row): Catalyst may share one deserialized
  * expression instance across concurrently running tasks in an
  * executor, and a shared Deflater would race. Cost is one native
  * deflate pass per row — the same order as the md5 the fingerprint
  * pipeline already pays. NULL blob → NULL; empty blob → the empty
  * DEFLATE stream's size (2 bytes at level 6), not zero.
  */
case class DeflateSize(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(level >= 1 && level <= 9,
    s"deflate level must be in [1, 9], got $level")

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_size"

  @transient private lazy val deflaters: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(level, true))
  @transient private lazy val scratch: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  def compute(bytes: Array[Byte]): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    if (total > Int.MaxValue) Int.MaxValue else total.toInt
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("deflateKernel", this,
      classOf[DeflateSize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}
