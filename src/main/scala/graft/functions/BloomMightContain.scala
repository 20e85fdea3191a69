package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, PlanExpression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-membership probe for the `graft_might_contain` SQL surface when
  * the sketch arrives as anything other than a binary literal (the
  * documented form is a scalar subquery over [[GraftFunctions
  * .bloomFilterAgg]] / `graft_bloom_agg`).
  *
  * Spark's own `BloomFilterMightContain` is built for the exact child
  * shape its runtime-filter rewrite rule produces; handed a USER-written
  * scalar subquery its `doGenCode` emits invalid Java (janino:
  * `Expression "java.lang.Long" is not an rvalue`), logs two
  * `ERROR CodeGenerator` lines per query, and silently falls back to
  * interpreted evaluation. Same answer, hidden cost. This expression
  * makes that fallback DELIBERATE: it is `CodegenFallback` by
  * declaration — no compile attempt, no error spray — and evaluates
  * exactly like Spark's interpreted path (sketch deserialized once per
  * task into a transient lazy val, `mightContainLong` per row, NULL
  * sketch or NULL probe → NULL). A probe against a driver-side constant
  * sketch is one virtual call per row; the projection around it stays
  * whole-stage-generated.
  *
  * The Scala-path probe ([[GraftFunctions.bloomMightContain]]) ships the
  * sketch as a binary literal — the shape `BloomFilterMightContain`
  * compiles correctly — and keeps full codegen; the SQL builder routes
  * literals there and everything else here (FunctionsSpec pins the
  * zero-`ERROR CodeGenerator` behavior of both).
  */
case class GraftMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BINARY bloom sketch, got ${left.dataType.sql}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BIGINT probe (use xxhash64 — the build " +
          s"side hashes with it), got ${right.dataType.sql}")
    else left match {
      // the sketch must be constant per query: it deserializes once and
      // is cached for every row (same restriction as Spark's own probe)
      case e if e.foldable => TypeCheckResult.TypeCheckSuccess
      case _: PlanExpression[_] => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a constant or scalar-subquery bloom sketch, " +
          "got a per-row expression")
    }

  // one deserialization per task (the expression tree is deserialized
  // per task, so the lazy val is task-local — no cross-thread sharing)
  @transient private lazy val bloomFilter: BloomFilter =
    left.eval() match {
      case null => null
      case bytes: Array[Byte] =>
        BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    }

  override def eval(input: InternalRow): Any =
    if (bloomFilter == null) null
    else right.eval(input) match {
      case null => null
      case v: java.lang.Long => bloomFilter.mightContainLong(v)
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftMightContain =
    copy(left = newLeft, right = newRight)
}
