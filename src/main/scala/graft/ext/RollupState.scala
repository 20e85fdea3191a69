package graft.ext

import org.apache.spark.sql.DataFrame
import graft.sources.DataStore
import graft.ops.Ops

/** Persistent incrementally-maintained rollup — [[IncrementalIndex]]'s
  * sibling for AGGREGATES: the stored object is an
  * [[graft.ops.Ops.aggregateState]] frame (per-group sufficient
  * statistics, |groups| rows however much history has flowed through),
  * each batch folds in with one |groups|-sized merge, and the
  * presentation rollup projects out on demand. History is read ONCE —
  * when it was a batch; a 100 TB event archive maintains a KB-scale
  * state table.
  *
  * The fold pins the merged state (localCheckpoint) BEFORE replacing
  * the stored object — the merge plan reads that object, and a lazy
  * replace would otherwise overwrite its own input mid-read (the same
  * discipline as [[IncrementalIndex.ingest]]).
  *
  * `count_distinct` has no bounded exact state; keep a sibling
  * HLL-sketch state (`Ops.aggregateStateHll` + `mergeAggregateStatesHll`
  * under its own object name) when estimated distincts are wanted.
  */
final case class RollupState(
    store: DataStore, name: String,
    keys: Seq[String], measures: Seq[(String, String)]) {

  /** Initialize (or replace) the state from a first batch. */
  def create(df: DataFrame, replace: Boolean = false): Unit =
    store.create(name, Ops.aggregateState(keys, measures)(df), replace)

  /** The stored sufficient-statistics frame. */
  def load(): DataFrame = store.getObject(name)

  /** Fold one batch into the stored state: aggregate the BATCH (its
    * only scan), merge with the |groups|-row stored frame, replace. */
  def fold(batch: DataFrame): Unit = {
    val merged = Ops.mergeAggregateStates(keys, measures)(
      load(), Ops.aggregateState(keys, measures)(batch))
      .localCheckpoint()
    store.create(name, merged, replace = true)
  }

  /** The presentation rollup — [[graft.ops.Ops.aggregate]]'s schema —
    * from the current state. */
  def result(): DataFrame = Ops.finalizeAggregate(keys, measures)(load())
}

/** [[RollupState]]'s sibling for DISTINCT counts: the stored object is
  * an [[graft.ops.Ops.aggregateStateHll]] frame (one ~1.5 KB
  * DataSketches HLL sketch per (group, field) FOREVER), batches fold
  * in with a register-wise union, and [[result]] projects the
  * estimates. Keep it under its own object name next to the exact
  * measure state — the two compose into one dashboard query with a
  * keys join. Same fold discipline (pin before replace) and the same
  * at-least-once restart caveat as the measure form. */
final case class RollupStateHll(
    store: DataStore, name: String,
    keys: Seq[String], fields: Seq[String], lgK: Int = 12) {

  def create(df: DataFrame, replace: Boolean = false): Unit =
    store.create(name, Ops.aggregateStateHll(keys, fields, lgK)(df), replace)

  def load(): DataFrame = store.getObject(name)

  def fold(batch: DataFrame): Unit = {
    val merged = Ops.mergeAggregateStatesHll(keys, fields)(
      load(), Ops.aggregateStateHll(keys, fields, lgK)(batch))
      .localCheckpoint()
    store.create(name, merged, replace = true)
  }

  /** `(keys…, <field>_distinct_est…)` from the current sketches. */
  def result(): DataFrame = Ops.finalizeAggregateHll(keys, fields)(load())
}

/** The SET-ALGEBRA leg of persistent distinct state: the stored object
  * is an [[graft.ops.Ops.aggregateStateTheta]] frame (one compact theta
  * sketch per (group, field)), batches fold in with a sketch union, and
  * the persisted sketches answer intersection/difference questions
  * across groups or across separately-maintained states
  * ([[graft.functions.GraftFunctions.thetaIntersect]] / `thetaDiff`) —
  * the overlap/churn queries HLL state cannot. Theta unions are
  * IDEMPOTENT under re-delivery (a set union of hash sets), so the
  * at-least-once restart caveat vanishes here, as with HLL. Exact and
  * deterministic while each group stays under `nominalEntries`
  * distincts. */
final case class RollupStateTheta(
    store: DataStore, name: String,
    keys: Seq[String], fields: Seq[String], nominalEntries: Int = 4096) {

  def create(df: DataFrame, replace: Boolean = false): Unit =
    store.create(name,
      Ops.aggregateStateTheta(keys, fields, nominalEntries)(df), replace)

  def load(): DataFrame = store.getObject(name)

  def fold(batch: DataFrame): Unit = {
    val merged = Ops.mergeAggregateStatesTheta(keys, fields, nominalEntries)(
      load(), Ops.aggregateStateTheta(keys, fields, nominalEntries)(batch))
      .localCheckpoint()
    store.create(name, merged, replace = true)
  }

  /** `(keys…, <field>_distinct_est…)` from the current sketches. */
  def result(): DataFrame = Ops.finalizeAggregateTheta(keys, fields)(load())
}

/** The QUANTILE leg of persistent rollup state: the stored object is an
  * [[graft.ops.Ops.aggregateStateKll]] frame (one ~2.4 KB DataSketches
  * KLL sketch per (group, field) at the default k = 200), batches fold
  * in with a sketch merge, and [[result]] projects the requested ranks.
  * Exact order statistics while a group has seen ≤ k values (the
  * oracle's regime); the ~1.65% rank-error band — and, unlike HLL,
  * NON-rerun-identical estimates from the compactor's random coin —
  * beyond. Same fold discipline (pin before replace); KLL merges are
  * NOT idempotent under re-delivery (re-merging the same batch
  * double-counts its values' ranks), so the at-least-once restart
  * caveat of the additive form applies here too. */
final case class RollupStateKll(
    store: DataStore, name: String,
    keys: Seq[String], fields: Seq[String], k: Int = 200) {

  def create(df: DataFrame, replace: Boolean = false): Unit =
    store.create(name, Ops.aggregateStateKll(keys, fields, k)(df), replace)

  def load(): DataFrame = store.getObject(name)

  def fold(batch: DataFrame): Unit = {
    val merged = Ops.mergeAggregateStatesKll(keys, fields, k)(
      load(), Ops.aggregateStateKll(keys, fields, k)(batch))
      .localCheckpoint()
    store.create(name, merged, replace = true)
  }

  /** `(keys…, <field>_p<rank>…)` from the current sketches. */
  def result(ranks: Seq[Double]): DataFrame =
    Ops.finalizeAggregateKll(keys, fields, ranks)(load())
}

/** The POINT-FREQUENCY leg of persistent rollup state: the stored
  * object is an [[graft.ops.Ops.aggregateStateCms]] frame (one
  * depth·width·8-byte count–min sketch per (group, field) FOREVER),
  * batches fold in with element-wise counter addition, and
  * [[result]] probes the current state for any key list — "how often
  * has THIS value occurred across all history" without re-reading
  * history or knowing the key at build time. Estimates never
  * undercount; exact and deterministic in the collision-free regime
  * (the oracle's — see [[graft.functions.CmsAgg]]). Same fold
  * discipline (pin before replace); CMS merges are NOT idempotent
  * under re-delivery (counters add), so the at-least-once restart
  * caveat of the additive form applies here too. */
final case class RollupStateCms(
    store: DataStore, name: String,
    keys: Seq[String], fields: Seq[String],
    depth: Int = 5, width: Int = 4096, seed: Int = 1) {

  def create(df: DataFrame, replace: Boolean = false): Unit =
    store.create(name,
      Ops.aggregateStateCms(keys, fields, depth, width, seed)(df), replace)

  def load(): DataFrame = store.getObject(name)

  def fold(batch: DataFrame): Unit = {
    val merged = Ops.mergeAggregateStatesCms(keys, fields, depth, width, seed)(
      load(), Ops.aggregateStateCms(keys, fields, depth, width, seed)(batch))
      .localCheckpoint()
    store.create(name, merged, replace = true)
  }

  /** `(keys…, item, <field>_freq_est)` for a static probe list. */
  def result(field: String, items: Seq[String]): DataFrame =
    Ops.finalizeAggregateCms(keys, field, items)(load())
}
