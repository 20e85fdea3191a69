package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators — absent from the reference (SURVEY.md §2.6:
  * bubbles has no ranking/lag/frame concept) but part of this engine's
  * extension surface, built on Spark's native window exec.
  *
  * Scale notes: a window with partitionBy shuffles once on the partition
  * key and sorts within partitions (spillable). Frames are pinned to ROWS
  * with fully tie-broken orderings so results are deterministic and
  * oracle-reproducible.
  */
object WindowOps {

  /** Top-k rows per group by `orderField` (desc), deterministic tie-break
    * on `tieBreak` (asc). The rank IS part of the output (callers whose
    * input already carries a column named `target` must pick another
    * name — withColumn would overwrite it). Spark plans partial top-k
    * pushdown (WindowGroupLimit) before the shuffle since 3.5 — no full
    * sort of losing rows. */
  def topKPerGroup(
      groupFields: Seq[String], orderField: String, tieBreak: String, k: Int,
      target: String = "rank")(
      df: DataFrame): DataFrame = {
    val w = Window.partitionBy(groupFields.map(col): _*)
      .orderBy(col(orderField).desc_nulls_last, col(tieBreak).asc_nulls_first)
    df.withColumn(target, row_number().over(w)).filter(col(target) <= k)
  }

  /** Running aggregate per group in a ROWS UNBOUNDED PRECEDING frame over
    * a total order (orderFields must be unique per group for
    * determinism). */
  def runningSum(
      groupFields: Seq[String], orderFields: Seq[String], valueField: String,
      target: String = "running_sum")(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(groupFields.map(col): _*)
      .orderBy(orderFields.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(target, sum(col(valueField)).over(w))
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event of the same key exceeds `gapSeconds`. Gap
    * arithmetic is on WHOLE-SECOND timestamps (`unix_timestamp`
    * truncates sub-second fractions — mirrored exactly by the oracle's
    * `floor(epoch(...))`), so a 30.8 s wall-clock gap between
    * fractional-second events compares as 30; use a sub-second gap
    * resolution only if both engines compare fractional epochs. Session
    * ids are a running count of session starts per key — the standard
    * lag + cumulative-sum shape, one shuffle on the key. */
  def sessionize(
      keyField: String, tsField: String, gapSeconds: Long,
      target: String = "session_id", tieBreak: Seq[String] = Nil)(
      df: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col(keyField))
      .orderBy((tsField +: tieBreak).map(col(_).asc_nulls_first): _*)
    val prevTs = lag(col(tsField), 1).over(byKey)
    val isStart = when(prevTs.isNull ||
      unix_timestamp(col(tsField)) - unix_timestamp(prevTs) > gapSeconds, 1L)
      .otherwise(0L)
    df.withColumn("__start", isStart)
      .withColumn(target,
        sum(col("__start")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__start")
  }

  /** Per-key event time deltas: whole seconds since the key's previous
    * event (null on each key's first event) — the inter-arrival series
    * behind rate limiting, bot detection, and session-gap tuning (plot
    * its distribution to pick [[sessionize]]'s `gapSeconds`). Same
    * single-shuffle lag window as sessionize; integer seconds keep the
    * column exact across engines. */
  def eventDeltas(
      keyField: String, tsField: String,
      target: String = "delta_seconds", tieBreak: Seq[String] = Nil)(
      df: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col(keyField))
      .orderBy((tsField +: tieBreak).map(col(_).asc_nulls_first): _*)
    val prevTs = lag(col(tsField), 1).over(byKey)
    df.withColumn(target,
      unix_timestamp(col(tsField)) - unix_timestamp(prevTs))
  }
}
