package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the cleaning primitive every multi-source
  * corpus needs before fingerprint/exact dedup (the same visible string
  * arrives composed from one crawler and decomposed from another, and
  * md5-based dedup treats them as distinct documents without this pass).
  *
  * Spark ships no normalizer function; the usual fallback is a Scala UDF,
  * which drops the projection out of whole-stage codegen and hides the
  * expression from Catalyst. This is the native form: a UnaryExpression
  * whose codegen emits one kernel call (the house pattern of every hash
  * kernel), keeping the surrounding stage compiled.
  *
  * DuckDB exposes `nfc_normalize` only, so the oracle surface pins the
  * NFC form cross-engine; the other forms and [[StripAccents]] are
  * spec-pinned against hand-written unicode fixtures (FunctionsSpec).
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"form must be one of NFC/NFD/NFKC/NFKD, got '$form'")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  @transient private lazy val javaForm =
    java.text.Normalizer.Form.valueOf(form)

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // the common case — already normalized ASCII/NFC text — allocates
    // nothing: isNormalized is a single scan with no output buffer
    if (java.text.Normalizer.isNormalized(str, javaForm)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, javaForm))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("normalizeKernel", this,
      classOf[NormalizeText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Accent/diacritic stripping: NFD-decompose, drop every combining mark
  * (Unicode category Mn/Me/Mc), NFC-recompose what remains — é→e, ü→u,
  * ñ→n, while NON-decomposable letters (ø, ł, ß) pass through unchanged
  * (they are letters, not letter+mark). The language-id/fuzzy-key
  * companion: accent-insensitive keys without locale tables. */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // pure-ASCII fast path: nothing to decompose, nothing to allocate
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      val tpe = Character.getType(cp)
      if (tpe != Character.NON_SPACING_MARK &&
          tpe != Character.ENCLOSING_MARK &&
          tpe != Character.COMBINING_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("stripAccentsKernel", this,
      classOf[StripAccents].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
