package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MMR (maximal marginal relevance) greedy re-ranking over a per-query
  * candidate pool — the diversity pass between retrieval and use: a
  * plain cosine top-k hands back five paraphrases of the same document;
  * MMR trades relevance against redundancy, picking at each step the
  * candidate maximizing `λ·rel − (1−λ)·maxSim(candidate, selected)` —
  * the few-shot-example / dedup-aware-retrieval selection rule
  * (Carbonell & Goldstein's formulation).
  *
  * Inputs are three PARALLEL arrays for one query's pool — ids
  * (`array<bigint>`), relevances (`array<double>`, cosine to the
  * query), vectors (`array<array<float>>`) — sorted by the caller in
  * (rel desc, id asc) pool order. Output: `array<struct<item_id,
  * cosine, mmr>>` in SELECTION order, `min(k, pool size)` long.
  *
  * Determinism contract (every branch oracle-mirrored):
  *  - the penalty is `max(0, sims…)` seeded at 0.0 — an ANTICORRELATED
  *    neighbor is already diverse, it does not earn a bonus; this also
  *    makes round 1 the uniform `λ·rel − (1−λ)·0.0` (no special case);
  *  - the argmax keeps the EARLIEST pool index on ties (strict `>`,
  *    the PqEncode tie discipline) — pool order is (rel desc, id asc),
  *    so ties resolve toward higher relevance, then lower id;
  *  - pairwise cosine is bit-for-bit [[CosineSimilarity]]'s float
  *    fold (array-order accumulation, zero-norm → 0.0), the op order
  *    the DuckDB oracle spells out.
  *
  * Cost: O(k · M · dim) per query over a pool of M — the classic MMR
  * incremental form: each candidate carries a running
  * `maxSim(cand, selected)` that a new selection can only RAISE, so
  * round r computes one cosine per candidate against the NEWEST
  * selection instead of re-folding the whole selected set (`max` is
  * order-free for non-NaN floats, so the running max is bit-identical
  * to the full re-scan; vectors and their norms extract/fold ONCE in
  * the same array order, so every pairwise cosine is still bit-for-bit
  * [[CosineSimilarity]]'s fold — §8 curve pins linear-in-k). Per-ROW
  * compute on |queries| rows, embarrassingly parallel, zero shuffle
  * beyond the pool build. The pool (an ANN/brute top-M) bounds
  * everything; MMR never sees the corpus. */
case class MmrSelect(
    first: Expression, second: Expression, third: Expression,
    k: Int, lambda: Double)
    extends TernaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")
  require(lambda >= 0.0 && lambda <= 1.0,
    s"lambda must be in [0, 1], got $lambda")

  override def checkInputDataTypes(): TypeCheckResult = {
    // element types only — containsNull is ignored because the natural
    // pool build (collect_list → array_sort → transform) types its
    // outputs containsNull=true even though no element can be null;
    // an ACTUAL null element is a caller bug and throws in select()
    val ok = (first.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) &&
      (second.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) &&
      (third.dataType match {
        case ArrayType(ArrayType(FloatType, _), _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<double>, " +
        s"array<array<float>>), got ${first.dataType.sql}, " +
        s"${second.dataType.sql}, ${third.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_mmr_select"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    MmrSelect.select(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], k, lambda)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.MmrSelect.select($a, $b, $c, $k, " +
        s"${lambda}D);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MmrSelect =
    copy(first = f, second = s, third = t)
}

object MmrSelect {

  /** [[CosineSimilarity.compute]]'s float-array fold over cached
    * vectors with PRE-FOLDED norms — identical bits to folding dot and
    * norms per pair (each accumulator's addition sequence is the array
    * order either way, and `sna*snb` multiplies in the same order). */
  private def cos(
      x: Array[Float], y: Array[Float], nx: Double, ny: Double): Double = {
    var dot = 0.0
    var p = 0
    while (p < x.length) {
      dot += x(p).toDouble * y(p).toDouble
      p += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (nx * ny)
  }

  /** Static kernel shared by eval and codegen. */
  def select(
      ids: ArrayData, rels: ArrayData, vecs: ArrayData,
      k: Int, lam: Double): ArrayData = {
    val n = ids.numElements()
    if (rels.numElements() != n || vecs.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_mmr_select: parallel arrays disagree on length " +
          s"($n ids, ${rels.numElements()} rels, " +
          s"${vecs.numElements()} vecs)")
    // one pass extracts vectors (ArrayData.getArray allocates — never
    // inside the selection loop), folds each norm in array order, and
    // validates: null elements and ragged dimensions are caller bugs
    // (a mixed-dim pool would make every pairwise cosine meaningless)
    // and throw up front, never silently score 0.0
    val fv = new Array[Array[Float]](n)
    val norm = new Array[Double](n)
    var g = 0
    while (g < n) {
      if (ids.isNullAt(g) || rels.isNullAt(g) || vecs.isNullAt(g))
        throw new IllegalArgumentException(
          s"graft_mmr_select: null pool element at index $g " +
            "(filter null candidates before pooling)")
      fv(g) = vecs.getArray(g).toFloatArray()
      if (fv(g).length != fv(0).length)
        throw new IllegalArgumentException(
          s"graft_mmr_select: pool vectors disagree on dimension " +
            s"(${fv(0).length} at index 0, ${fv(g).length} at index $g)")
      var na = 0.0
      var p = 0
      while (p < fv(g).length) {
        na += fv(g)(p).toDouble * fv(g)(p).toDouble
        p += 1
      }
      norm(g) = math.sqrt(na)
      g += 1
    }
    val m = math.min(k, n)
    val out = new Array[Any](m)
    val chosen = new Array[Boolean](n)
    // running max(0, maxSim(i, selected)): a new selection can only
    // RAISE it, and float max is order-free, so updating against the
    // newest selection alone is bit-identical to a full re-scan
    val maxSim = new Array[Double](n) // seeded 0.0: no diversity bonus
    var r = 0
    while (r < m) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!chosen(i)) {
          val score = lam * rels.getDouble(i) - (1.0 - lam) * maxSim(i)
          if (best < 0 || score > bestScore) { best = i; bestScore = score }
        }
        i += 1
      }
      chosen(best) = true
      out(r) = InternalRow(ids.getLong(best), rels.getDouble(best),
        bestScore)
      var j = 0
      while (j < n) {
        if (!chosen(j)) {
          val sim = cos(fv(j), fv(best), norm(j), norm(best))
          if (sim > maxSim(j)) maxSim(j) = sim
        }
        j += 1
      }
      r += 1
    }
    new GenericArrayData(out)
  }
}
