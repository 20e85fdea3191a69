package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.DataStore

/** Persistence for the LEARNED artifacts the inference kernels consume
  * — the train → persist → serve seam that [[IncrementalIndex]] is for
  * dedup state and `Similarity.ivfSave` for ANN indexes: a BPE merge
  * table ([[TextOps.learnBpeMerges]] → `bpeTokenCount`/`bpeTokenize`)
  * or an integer-quantized classifier weight table
  * (→ [[TextOps.linearTextScore]]) round-trips through any
  * [[DataStore]] as a plain ordered DataFrame, so models version, ship,
  * and audit like every other table (and a SQL user can SELECT them).
  *
  * Both loads materialize driver-side by design — these artifacts ARE
  * expression parameters (the kernels build hash tables from them), so
  * they must be small enough to ride the plan; the collect is bounded
  * by the model size, not the corpus. Order is explicit (`rank` /
  * `gram`), never file order. */
object ModelStore {

  /** Persist a merge table in rank order: `(rank, left, right)`. */
  def saveMerges(
      store: DataStore, name: String, merges: Seq[(String, String)],
      replace: Boolean = false)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    require(merges.nonEmpty, "empty merge table")
    store.create(name,
      merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
        .toDF("rank", "left", "right"),
      replace)
  }

  /** Load a merge table back, in rank order — feeds the BPE kernels'
    * validating constructors directly. */
  def loadMerges(store: DataStore, name: String): Seq[(String, String)] =
    store.getObject(name)
      .select("rank", "left", "right")
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq

  /** Persist a classifier weight table: `(gram, weight)`. */
  def saveWeights(
      store: DataStore, name: String, weights: Seq[(String, Long)],
      replace: Boolean = false)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    require(weights.nonEmpty, "empty weight table")
    store.create(name, weights.toDF("gram", "weight"), replace)
  }

  /** Load a weight table back, gram-ordered (deterministic; the kernel
    * hashes it, so order never changes scores). */
  def loadWeights(store: DataStore, name: String): Seq[(String, Long)] =
    store.getObject(name)
      .select("gram", "weight")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
      .toSeq

  /** Persist an n-gram count table `(n, gram, occurrences)`
    * ([[TextOps.lmCountTable]] → [[TextOps.trigramLmQuality]]) — the
    * KenLM-style count file. Unlike merges/weights this artifact is
    * VOCABULARY-sized, so both legs stay DISTRIBUTED: save is one
    * store write, load returns the DataFrame for the scorer's
    * table-sized equi-joins — nothing is ever collected. */
  def saveCounts(
      store: DataStore, name: String, counts: DataFrame,
      replace: Boolean = false): Unit = {
    require(counts.columns.length == 3,
      s"counts must be (n, gram, occurrences) rows, got " +
        counts.columns.mkString(", "))
    store.create(name, counts.toDF("n", "gram", "occurrences"), replace)
  }

  /** Load a count table back — feeds [[TextOps.trigramLmQuality]]
    * directly. Column-name-pinned so a store that reorders physical
    * columns cannot silently swap `n` for `occurrences`. */
  def loadCounts(store: DataStore, name: String): DataFrame =
    store.getObject(name).select("n", "gram", "occurrences")
}
