package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared greedy-BPE merge engine behind [[BpeTokenCount]] and
  * [[BpeTokenize]]: rank map construction, the rank-consistency
  * validation both kernels require, and the per-word encode loop
  * (repeatedly find the lowest-rank adjacent pair, merge all its
  * occurrences left-to-right, until no pair has a rank — the real
  * tokenizer algorithm, O(applied merges × word length) per word with
  * O(1) rank lookups independent of vocabulary size). The pair-key
  * separator is NUL (operands are validated space-free, but NUL keeps
  * the key unambiguous for ANY space-free operand pair). */
private[functions] object BpeKernel {

  /** Word-initial piece marker (the SentencePiece convention): lets a
    * flat piece stream round-trip to text (marker → space). Texts
    * containing the marker character itself are out of contract. */
  val Marker = "▁"

  def validate(merges: Seq[(String, String)]): Unit = {
    require(merges.nonEmpty, "merge table must be non-empty")
    val formed = scala.collection.mutable.HashSet[String]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(a, b).foreach { op =>
        require(op.nonEmpty, s"merge $i has an empty operand")
        require(!op.contains(' '),
          s"merge $i operand '$op' contains a space (words are the merge boundary)")
        require(op.codePointCount(0, op.length) == 1 || formed.contains(op),
          s"merge $i operand '$op' is multi-char but not the output of an " +
            "earlier merge (rank-inconsistent vocabulary; the HOF form " +
            "accepts such tables with pass-per-rank semantics)")
      }
      require(formed.add(a + b),
        s"merge $i output '${a + b}' duplicates an earlier merge's output")
    }
  }

  def buildRank(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + "\u0000" + b, Int.box(i))
    }
    m
  }

  /** Greedy BPE symbols of the word s[from, until); empty for
    * zero-length words. */
  def encodeWord(
      s: String, from: Int, until: Int,
      merges: IndexedSeq[(String, String)],
      rank: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    if (until <= from) return new java.util.ArrayList[String](0)
    var syms = new java.util.ArrayList[String](until - from)
    var i = from
    while (i < until) {
      val cc = Character.charCount(s.codePointAt(i))
      syms.add(s.substring(i, i + cc))
      i += cc
    }
    var done = false
    while (!done && syms.size > 1) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            out.add(a + b); k += 2
          } else {
            out.add(syms.get(k)); k += 1
          }
        }
        syms = out
      }
    }
    syms
  }
}

/** Native greedy-BPE token counter — the production form of
  * [[graft.ext.TextOps.bpeTokenCountHof]], whose merge fold builds one
  * HOF pass PER RANK into the expression tree (fine at 10 merges,
  * unusable at a tokenizer's 50k). The merge engine is [[BpeKernel]]
  * (shared with [[BpeTokenize]], so count and pieces can never
  * disagree).
  *
  * Bit-parity with the HOF spec form (and therefore the shared DuckDB
  * oracle) holds for RANK-CONSISTENT vocabularies — every multi-char
  * operand is the output of an earlier merge, and outputs are distinct
  * — the properties real learned vocabularies have by construction
  * (a symbol must exist before a later merge can reference it, and each
  * token string is created once during training). Under those two
  * properties lowest-rank-first application and the spec form's
  * one-pass-per-rank fold perform the identical merge sequence; without
  * them they can diverge, so construction REJECTS rank-inconsistent
  * tables instead of silently differing (HashExpressionsSpec pins
  * kernel-vs-HOF equality).
  *
  * Word boundaries are single spaces (the library's shared tokenizer);
  * symbols are Unicode code points, matching the HOF form's
  * codepoint-indexed `substring`. NULL text yields NULL; zero-length
  * words count 0 symbols.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  BpeKernel.validate(merges)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val mergesArr = merges.toIndexedSeq
  @transient private lazy val rank = BpeKernel.buildRank(merges)

  def compute(text: UTF8String): Long = {
    val s = text.toString
    val len = s.length
    var total = 0L
    var wStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        total += BpeKernel.encodeWord(s, wStart, i, mergesArr, rank).size
        wStart = i + 1
      }
      i += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeKernel", this, classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Native greedy-BPE tokenizer — [[BpeTokenCount]]'s merge engine
  * ([[BpeKernel]]: identical word split, validation, and merge
  * sequence, so `size(graft_bpe_tokenize(t)) = graft_bpe_count(t)` by
  * construction), emitting the PIECES instead of their count: the form
  * context-window operators need, because clipping BY a token count
  * requires the tokens themselves
  * ([[graft.ext.TextOps.truncateTokensBpe]] /
  * [[graft.ext.TextOps.chunkTextsBpe]]).
  *
  * Each word-initial piece carries the `▁` marker prefix
  * ([[BpeKernel.Marker]], the SentencePiece convention), so the flat
  * piece stream round-trips: concatenate pieces, marker → space, drop
  * the single leading space ([[graft.ext.TextOps.bpeDetokenize]]) —
  * and any SLICE of the stream rejoins correctly, including slices
  * starting mid-word (no leading marker → no spurious space). Texts
  * containing the marker character are out of contract (documented,
  * not scanned per row). NULL text yields NULL; zero-length words
  * (consecutive spaces) contribute no pieces — rejoin is
  * single-space-canonical, same as the whitespace truncation path. */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  BpeKernel.validate(merges)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokenize"

  @transient private lazy val mergesArr = merges.toIndexedSeq
  @transient private lazy val rank = BpeKernel.buildRank(merges)

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val len = s.length
    val out = new java.util.ArrayList[AnyRef]()
    var wStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        val syms = BpeKernel.encodeWord(s, wStart, i, mergesArr, rank)
        var k = 0
        while (k < syms.size) {
          val piece =
            if (k == 0) BpeKernel.Marker + syms.get(0) else syms.get(k)
          out.add(UTF8String.fromString(piece))
          k += 1
        }
        wStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeTokenizer", this, classOf[BpeTokenize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)
}
