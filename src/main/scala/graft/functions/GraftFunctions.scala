package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Entry points for graft's native Catalyst expressions.
  *
  * Three ways in, mirroring how Spark's own functions surface:
  *  - [[GraftFunctions.cosine]]: Column API, no registration needed —
  *    builds the expression node directly.
  *  - [[GraftFunctions.register]]: installs `graft_cosine` into an
  *    existing session's function registry for `spark.sql(...)` use.
  *  - [[GraftExtensions]]: `SparkSessionExtensions` injector for
  *    cluster-wide installation via
  *    `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  private val cosineInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "graft_cosine")

  private val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_cosine expects exactly 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  /** Native codegen cosine similarity over two `array<float>` columns. */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Native MinHash signature over a shingle array (see
    * [[MinHashSignature]]). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))

  /** Native distinct-element Jaccard over two string arrays (see
    * [[ArrayJaccard]]). */
  def arrayJaccard(a: Column, b: Column): Column =
    Bridge.column(ArrayJaccard(Bridge.expression(a), Bridge.expression(b)))

  /** Native 60-bit SimHash over a token array (see [[SimHash60]]). */
  def simhash60(tokens: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(tokens)))

  /** Native winnowing fingerprints over a string (see
    * [[WinnowFingerprints]]). */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))

  /** Native content-defined chunk fingerprints over a blob (see
    * [[CdcChunkFingerprints]]). */
  def cdcChunkFingerprints(
      blob: Column, minBytes: Int, avgBits: Int, maxBytes: Int): Column =
    Bridge.column(CdcChunkFingerprints(
      Bridge.expression(blob), minBytes, avgBits, maxBytes))

  /** Evaluate `c` ONCE per row and hand it to `f` as a bound lambda
    * variable (via a one-element array + transform + element_at).
    *
    * Catalyst performs no common-subexpression elimination across
    * higher-order-function lambdas: an expression subtree referenced N
    * times inside a lambda body is evaluated N times per row (and a
    * subtree referenced inside a lambda that iterates M elements is
    * evaluated M times). Wrapping the subtree with `bind` turns those
    * references into bound-variable reads. Use it whenever an expensive
    * expression (a hash array, a tokenization) feeds a transform/
    * aggregate/zip_with body. */
  def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** The shared deterministic 32-bit content hash: unsigned value of the
    * first 8 hex chars of md5(salt || key) — the single definition behind
    * every hash-keyed sampler/splitter ([[graft.ops.Ops.sampleHash]],
    * `sampleStratifiedHash`, `TextOps.hashSplit`) and their oracle
    * mirrors; cutoff = fraction · 2³². */
  def md5Prefix32(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Register `graft_cosine` for SQL use in this session (idempotent). */
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_cosine", cosineInfo, cosineBuilder)
}

/** `spark.sql.extensions` injector: registers graft's native functions
  * at session build on every node of a cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      { children: Seq[Expression] =>
        require(children.length == 2, "graft_cosine expects exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
}
