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
  * Cost: O(k · M² · dim) per query over a pool of M — per-ROW compute
  * on |queries| rows, embarrassingly parallel, zero shuffle beyond the
  * pool build. The pool (an ANN/brute top-M) bounds everything; MMR
  * never sees the corpus. */
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

  /** [[CosineSimilarity.compute]]'s float-array fold, verbatim op
    * order, on two pool members. Ragged pools are a caller bug — a
    * mixed-dim pool would make every pairwise cosine meaningless — so
    * dimension mismatch throws (the parallel-array error style of
    * [[select]]) rather than silently scoring 0.0. */
  private def cos(vecs: ArrayData, i: Int, j: Int): Double = {
    val x = vecs.getArray(i)
    val y = vecs.getArray(j)
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_mmr_select: pool vectors disagree on dimension " +
          s"($n at index $i, ${y.numElements()} at index $j)")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var p = 0
    while (p < n) {
      val xi = x.getFloat(p).toDouble
      val yi = y.getFloat(p).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      p += 1
    }
    val sna = math.sqrt(na); val snb = math.sqrt(nb)
    if (sna == 0.0 || snb == 0.0) 0.0 else dot / (sna * snb)
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
    var g = 0
    while (g < n) {
      if (ids.isNullAt(g) || rels.isNullAt(g) || vecs.isNullAt(g))
        throw new IllegalArgumentException(
          s"graft_mmr_select: null pool element at index $g " +
            "(filter null candidates before pooling)")
      g += 1
    }
    val m = math.min(k, n)
    val out = new Array[Any](m)
    val chosen = new Array[Boolean](n)
    val chosenIdx = new Array[Int](m)
    var r = 0
    while (r < m) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!chosen(i)) {
          var maxSim = 0.0 // max(0, sims…): anticorrelation is not a bonus
          var s = 0
          while (s < r) {
            val sim = cos(vecs, i, chosenIdx(s))
            if (sim > maxSim) maxSim = sim
            s += 1
          }
          val score = lam * rels.getDouble(i) - (1.0 - lam) * maxSim
          if (best < 0 || score > bestScore) { best = i; bestScore = score }
        }
        i += 1
      }
      chosen(best) = true
      chosenIdx(r) = best
      out(r) = InternalRow(ids.getLong(best), rels.getDouble(best),
        bestScore)
      r += 1
    }
    new GenericArrayData(out)
  }
}
