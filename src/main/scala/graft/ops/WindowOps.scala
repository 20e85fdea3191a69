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

  /** Rolling aggregate over the trailing `k` rows (current row
    * inclusive) per group in a totally ordered ROWS frame: emits the
    * moving sum, the moving mean (sum over the ACTUAL frame row count,
    * so the first k−1 rows average over what exists rather than
    * swallowing phantom zeros), and the frame count. The smoothing
    * window every metrics/training-curve dashboard runs.
    *
    * Oracle discipline: a framed `sum` may visit rows in any order the
    * engine likes, so exact cross-engine equality holds for
    * integral-valued or scaled-long measures (the library's money
    * doctrine); the mean is then one IEEE division. One shuffle on the
    * group key, spillable in-partition sort, O(1) per row via the
    * sliding frame. */
  def rollingAgg(
      groupFields: Seq[String], orderFields: Seq[String], valueField: String,
      k: Int, prefix: String = "rolling_")(df: DataFrame): DataFrame = {
    require(k >= 1, s"frame must span at least 1 row, got $k")
    val w = Window.partitionBy(groupFields.map(col): _*)
      .orderBy(orderFields.map(col(_).asc_nulls_first): _*)
      .rowsBetween(-(k - 1), Window.currentRow)
    df.withColumn(s"${prefix}sum", sum(col(valueField)).over(w))
      .withColumn(s"${prefix}n", count(col(valueField)).over(w))
      .withColumn(s"${prefix}mean",
        col(s"${prefix}sum") / col(s"${prefix}n"))
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

  /** Latest row per key — the SCD1 read-side primitive (current state
    * of every entity from its event history; [[graft.ops.TemporalOps.applyChanges]]
    * maintains the same thing incrementally, this derives it from
    * scratch): the row with the greatest (`orderField`, `tieBreak`)
    * per key, whole row carried. WindowGroupLimit prunes losers before
    * the sort materializes; rows with a NULL order value are dropped
    * (they cannot be "latest"). `earliest = true` flips the direction
    * for first-touch attribution. */
  def latestPerKey(
      keyField: String, orderField: String, tieBreak: String,
      earliest: Boolean = false)(df: DataFrame): DataFrame = {
    val ord =
      if (earliest) Seq(col(orderField).asc, col(tieBreak).asc)
      else Seq(col(orderField).desc, col(tieBreak).desc)
    df.filter(col(orderField).isNotNull)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(keyField)).orderBy(ord: _*)))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Running DISTINCT count per key: for each event, how many distinct
    * `valueField` values its key has seen up to and including it — the
    * "cumulative unique users/products/errors over time" curve. Spark
    * windows cannot express `count(DISTINCT) OVER`, so it decomposes
    * into two exact windows: flag each (key, value)'s FIRST occurrence
    * in event order (row_number over (key, value)), then running-sum
    * the flags per key — integer arithmetic end to end, one shuffle per
    * window. `orderFields` must totally order each key's events (add a
    * tie-break) or first-occurrence attribution is nondeterministic. */
  def cumulativeDistinct(
      keyField: String, valueField: String, orderFields: Seq[String],
      target: String = "distinct_so_far")(df: DataFrame): DataFrame = {
    val order = orderFields.map(col(_).asc_nulls_first)
    val firstW = Window.partitionBy(col(keyField), col(valueField))
      .orderBy(order: _*)
    val cumW = Window.partitionBy(col(keyField)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__first",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .withColumn(target, sum(col("__first")).over(cumW))
      .drop("__first")
  }

  /** Per-session rollup — [[sessionize]] with the aggregation everyone
    * writes next already attached: one row per (key, session) carrying
    * start/end timestamps, whole-second duration (the same truncated
    * epoch arithmetic as the gap test, so a session's duration and its
    * gap criterion can't disagree about clock math), and the event
    * count. Adds ONE hash-agg on (key, session_id) after sessionize's
    * single key-shuffle window — the session key is a refinement of the
    * partition key, so AQE coalesces rather than reshuffles. */
  def sessionStats(
      keyField: String, tsField: String, gapSeconds: Long,
      tieBreak: Seq[String] = Nil)(df: DataFrame): DataFrame =
    sessionize(keyField, tsField, gapSeconds, tieBreak = tieBreak)(df)
      .groupBy(col(keyField), col("session_id"))
      .agg(min(col(tsField)).as("session_start"),
        max(col(tsField)).as("session_end"),
        (unix_timestamp(max(col(tsField))) -
          unix_timestamp(min(col(tsField)))).as("duration_s"),
        count(lit(1)).as("n_events"))

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

  /** First-order event-transition matrix — the Markov view of user
    * journeys that [[eventFunnel]]'s fixed step list cannot see: for
    * every consecutive event pair within a user's (ts, tieBreak)
    * order, count (from_type → to_type) and emit the row-conditional
    * probability p = n / Σ_from n. The product-analytics "what happens
    * AFTER an error" / journey-graph feeder (pair it with
    * [[graft.ext.GraphOps.pageRank]] over the transition edges for a
    * journey-importance rank). Each p is one exact integer division
    * off two hash-agg counts — oracle bit-for-bit. A user's last event
    * has no successor and contributes no pair; single-event users
    * vanish (documented).
    *
    * Scale shape: one per-user window (the [[eventDeltas]] shuffle) +
    * one (from, to) hash-agg + one |types|-row broadcast join for the
    * denominators. Never a per-user collect. */
  def eventTransitions(
      keyField: String, tsField: String, typeField: String,
      tieBreak: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col(keyField))
      .orderBy((tsField +: tieBreak).map(col(_).asc_nulls_first): _*)
    // NULL-ts events would sort nulls-first and fabricate transition
    // pairs at an arbitrary position in the journey — drop them, the
    // temporal doctrine burstiness/activityProfile already follow.
    val pairs = df
      .filter(col(tsField).isNotNull)
      .withColumn("__next", lead(col(typeField), 1).over(byKey))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeField).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .withColumn("p",
        col("n").cast("double") / col("__tot").cast("double"))
      .select("from_type", "to_type", "n", "p")
  }

  /** Activity heatmap — per key, the (day-of-week × hour) event
    * distribution: `(key, dow, hour, n, share)` with share = n / key
    * total, the "when does this cohort act?" view feeding crawl-rate
    * and batch-window decisions. Day/hour derive ARITHMETICALLY from
    * the floor epoch (`dow = (⌊epoch/86400⌋ + 3) mod 7`, 0 = Monday —
    * 1970-01-01 was a Thursday; `hour = ⌊(epoch mod 86400)/3600⌋`, UTC
    * by construction) rather than from calendar functions, because the
    * two engines disagree on week conventions but cannot disagree on
    * integer division. Negative epochs would floor-vs-truncate differ —
    * pre-1970 timestamps are out of contract. One hash-agg + a
    * \|keys\|-row total join. */
  def activityProfile(
      keyField: String, tsField: String)(df: DataFrame): DataFrame = {
    val ep = unix_timestamp(col(tsField))
    val counts = df
      .filter(col(tsField).isNotNull)
      .groupBy(col(keyField),
        ((ep / 86400).cast("long") + 3).mod(7).cast("int").as("dow"),
        (ep.mod(86400) / 3600).cast("int").as("hour"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col(keyField)).agg(sum("n").as("__tot"))
    counts.join(totals, Seq(keyField))
      .select(col(keyField), col("dow"), col("hour"), col("n"),
        (col("n").cast("double") / col("__tot").cast("double"))
          .as("share"))
      .orderBy(col(keyField), col("dow"), col("hour"))
  }

  /** Inter-arrival burstiness per key — the Goh–Barabási index
    * `B = (cv − 1)/(cv + 1)` over the gaps between consecutive
    * same-key events: B → −1 is a metronome, 0 is Poisson, → 1 is a
    * bursty bot/batch-import signature — the behavioral fingerprint a
    * rate probe cannot see (two users with identical event counts can
    * sit at opposite ends of B). Emits per key (≥ 2 events):
    * `n_events, n_gaps, mean_gap_sec, cv_gap, burstiness`.
    *
    * Exactness: gaps are INTEGER seconds (the floor-epoch sessionize
    * convention), the per-key sufficient statistics (Σg, Σg²) sum in
    * decimal(38,0) — order-independent at any scale, the corrMatrix
    * money doctrine — and mean/cv/B are a fixed dag of IEEE ops with
    * the variance floored at 0 before the sqrt (last-ulp rounding must
    * not produce NaN). All-zero gaps (mean 0) emit NULL cv and NULL B.
    * One lag window (the per-key shuffle) + one hash-agg. */
  def burstiness(
      keyField: String, tsField: String, tieBreak: Seq[String] = Nil)(
      df: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col(keyField))
      .orderBy((tsField +: tieBreak).map(col(_).asc_nulls_first): _*)
    val gaps = df
      .filter(col(tsField).isNotNull)
      .withColumn("__prev", lag(unix_timestamp(col(tsField)), 1)
        .over(byKey))
      .withColumn("__g",
        unix_timestamp(col(tsField)) - col("__prev"))
    val stats = gaps
      .groupBy(col(keyField))
      .agg(count(lit(1)).as("n_events"),
        count(col("__g")).as("n_gaps"),
        sum(col("__g").cast("decimal(38,0)")).as("__sg"),
        sum((col("__g").cast("decimal(19,0)") *
          col("__g").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("__sg2"))
      .filter(col("n_gaps") >= 1)
    val mean = col("__sg").cast("double") / col("n_gaps").cast("double")
    val varPop = greatest(
      (col("n_gaps").cast("double") * col("__sg2").cast("double") -
        col("__sg").cast("double") * col("__sg").cast("double")) /
        (col("n_gaps").cast("double") * col("n_gaps").cast("double")),
      lit(0.0))
    stats
      .withColumn("mean_gap_sec", mean)
      .withColumn("cv_gap",
        when(col("mean_gap_sec") === 0.0, lit(null).cast("double"))
          .otherwise(sqrt(varPop) / col("mean_gap_sec")))
      .withColumn("burstiness",
        when(col("cv_gap").isNull, lit(null).cast("double"))
          .otherwise((col("cv_gap") - 1.0) / (col("cv_gap") + 1.0)))
      .select(col(keyField), col("n_events"), col("n_gaps"),
        col("mean_gap_sec"), col("cv_gap"), col("burstiness"))
  }

  /** Top-k frequent event PATHS — [[eventTransitions]] one level up:
    * the pair matrix shows WHERE users go next, the path table shows
    * the ROUTES they take (`signup -> browse -> purchase` vs
    * `signup -> browse -> exit` is the product question pairs cannot
    * answer — a Markov chain forgets where it came from). Each window
    * of `steps` CONSECUTIVE same-user events (ordered by ts, then
    * `tieBreak`) contributes one path; users with fewer events than
    * `steps` contribute none. Emits `(path, n)` — the " -> "-joined
    * route and its exact count — top-k by (n desc, path asc) via
    * orderBy+limit (TakeOrderedAndProject, no global sort).
    *
    * Shape: `steps−1` lead() columns ride ONE per-user window (one
    * shuffle), then a hash-agg on the step tuple — never a per-user
    * collect; path cardinality is bounded by |types|^steps, the
    * hash-agg's key space, which is why `steps` is capped at 8. */
  def eventPaths(
      keyField: String, tsField: String, typeField: String,
      steps: Int = 3, k: Int = 20, tieBreak: Seq[String] = Nil)(
      df: DataFrame): DataFrame = {
    require(steps >= 2 && steps <= 8, s"steps must be in [2, 8]: $steps")
    require(k >= 1, s"k must be >= 1, got $k")
    val byKey = Window.partitionBy(col(keyField))
      .orderBy((tsField +: tieBreak).map(col(_).asc_nulls_first): _*)
    val withLeads = (1 until steps).foldLeft(
      df.withColumn("__s0", col(typeField))) { (d, i) =>
      d.withColumn(s"__s$i", lead(col(typeField), i).over(byKey)) }
    withLeads
      .filter((1 until steps).map(i => col(s"__s$i").isNotNull)
        .reduce(_ && _))
      .groupBy((0 until steps).map(i => col(s"__s$i")): _*)
      .agg(count(lit(1)).as("n"))
      .select(concat_ws(" -> ",
        (0 until steps).map(i => col(s"__s$i")): _*).as("path"), col("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** Sequential conversion funnel over an event stream: a user reaches
    * step i when an event of `steps(i)`'s type occurs STRICTLY AFTER
    * the timestamp at which they reached step i−1 (first qualifying
    * occurrence wins; step 0 is the user's earliest event of that
    * type). Emits one row per step: `(step, step_name, users,
    * conversion)`, conversion = users at step / users at step 0 (one
    * exact-rounded division; 0.0 when nobody enters). The
    * product-analytics staple next to [[sessionize]] / [[eventDeltas]].
    *
    * Scale shape: one filtered min-aggregation per step plus a user
    * equi-join against the previous step's (user, ts) frame — steps are
    * few and each frame is ≤ one row per user, so cost is `|steps|`
    * bounded hash-aggs over the event table, never a per-user sort or
    * collect. NULL-timestamp events never qualify (min over none). */
  def eventFunnel(
      keyField: String, tsField: String, typeField: String,
      steps: Seq[String])(df: DataFrame): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step required")
    val events = df.select(col(keyField).as("__u"), col(tsField).as("__t"),
      col(typeField).as("__e")).filter(col("__t").isNotNull)
    // each step's (user, ts) frame materializes once (≤ one row per
    // user) so step k does not lazily recompute the whole chain 0..k −
    // the event table is scanned once per step, with the type filter
    // pushed to the scan
    val reached = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = events.filter(col("__e") === step)
        val qualified = prev match {
          case None => hits
          case Some(p) => hits.join(p.select(col("__u"), col("__pt")), "__u")
            .filter(col("__t") > col("__pt"))
        }
        Some(qualified.groupBy(col("__u")).agg(min(col("__t")).as("__pt"))
          .localCheckpoint())
    }.flatten
    val counts = reached.zipWithIndex.map { case (r, i) =>
      r.agg(count(lit(1)).as("users"))
        .select(lit(i.toLong).as("step"), lit(steps(i)).as("step_name"),
          col("users"))
    }.reduce(_ unionByName _)
    val entered = counts.filter(col("step") === 0L)
      .select(col("users").as("__n0"))
    counts.crossJoin(broadcast(entered))
      .select(col("step"), col("step_name"), col("users"),
        when(col("__n0") === 0L, lit(0.0))
          .otherwise(col("users").cast("double") / col("__n0").cast("double"))
          .as("conversion"))
  }

  /** Cohort retention matrix: users cohorted by the week of their FIRST
    * event; one row per (cohort_week, week_offset) counting distinct
    * users from that cohort active in that week. `week_offset` is whole
    * weeks between the activity week and the cohort week (both
    * `date_trunc` Monday starts — identical in the oracle); offset 0 is
    * the cohort's own week, so every cohort has it. The
    * product-analytics view a training-data event store gets asked for
    * next after the funnel.
    *
    * Scale shape: one per-user min-aggregation (first event), one user
    * equi-join back to the event stream, one distinct-count hash-agg on
    * (cohort_week, offset) — no window over the raw events, no per-user
    * sort. NULL-timestamp events drop (they belong to no week). */
  def cohortRetention(
      keyField: String, tsField: String)(df: DataFrame): DataFrame = {
    val events = df.select(col(keyField).as("__u"), col(tsField).as("__t"))
      .filter(col("__t").isNotNull)
    val first = events.groupBy(col("__u"))
      .agg(date_trunc("week", min(col("__t"))).cast("date").as("__cw"))
    events.join(first, "__u")
      .select(col("__u"), col("__cw"),
        ((datediff(date_trunc("week", col("__t")).cast("date"), col("__cw")))
          / 7).cast("long").as("__off"))
      .groupBy(col("__cw"), col("__off"))
      .agg(countDistinct(col("__u")).as("active_users"))
      .select(col("__cw").as("cohort_week"), col("__off").as("week_offset"),
        col("active_users"))
  }

  /** Time-weighted average per key: each event's value "holds" until
    * the key's next event, and the average weights values by how long
    * they held — the metrics-correct mean for irregularly sampled
    * series, where the arithmetic mean over-weights bursts (TWAP in
    * finance, time-weighted gauges in observability). Emits one row per
    * key: `twa` plus the covered duration `dur_us`. The key's LAST
    * event has no holding interval and contributes no weight
    * (single-event keys therefore vanish); keys whose covered duration
    * is zero (all events on one timestamp) emit NULL.
    *
    * Exactness contract: pass an INTEGRAL value column (cent-scale
    * money first — the library doctrine). value × µs-duration products
    * and their sums then stay exact 64-bit integers (bound: max|v| ×
    * total-duration-µs < 2⁶³ — a cent-scaled 10⁵ value over a year is
    * ~3×10¹⁸, inside the bound; rescale beyond it), and the average is
    * ONE final IEEE division. One lead window + one hash-agg, both on
    * the key's single shuffle; NULL timestamps drop (the temporal
    * doctrine). */
  def timeWeightedAvg(
      keyField: String, tsField: String, valueField: String,
      tieBreak: String)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__us").asc, col("__tb").asc_nulls_first)
    df.filter(col(tsField).isNotNull)
      .select(col(keyField).as("__k"),
        unix_micros(col(tsField)).as("__us"),
        col(valueField).cast("long").as("__v"), col(tieBreak).as("__tb"))
      .withColumn("__d", lead(col("__us"), 1).over(w) - col("__us"))
      .filter(col("__d").isNotNull)
      .groupBy("__k")
      .agg(sum(col("__v") * col("__d")).as("__wv"),
        sum(col("__d")).as("dur_us"))
      .select(col("__k").as(keyField),
        when(col("dur_us") === 0L, lit(null))
          .otherwise(col("__wv").cast("double") / col("dur_us").cast("double"))
          .as("twa"),
        col("dur_us"))
  }

  /** Exponentially weighted moving average per key along event order:
    * `y₁ = v₁, yᵢ = α·vᵢ + (1−α)·yᵢ₋₁` — the time-series smoother for
    * metric dashboards and drift monitors, emitted as one `ewma` value
    * PER EVENT alongside the raw value.
    *
    * Spark has no recursive window, and the closed form needs `powΔ`
    * (libm — banned from scores by the library doctrine: pow is not
    * bit-reproducible across engines). So the recurrence runs as a
    * LITERAL sequential fold: one `collect_list` per key, `sort_array`
    * by (ts, tieBreak), one higher-order `aggregate` building the
    * smoothed array in event order, then `posexplode` back to rows.
    * Every step is the same two IEEE multiplies + add the oracle's
    * recursive CTE performs, so results hash-match bit-for-bit.
    *
    * Scale shape: ONE hash-agg shuffle on the key; per-key memory is
    * the key's event array (the explicit trade — a key's history must
    * fit a task, the same bound every per-key sort op here carries;
    * shard long histories by (key, period) first when they don't).
    * Rows with NULL timestamps are dropped (no place in event order —
    * the temporal doctrine).
    *
    * `exactOrder = false` is the PRODUCTION mode for unbounded
    * histories: repartition by key + sortWithinPartitions (the
    * secondary-sort pattern — one shuffle, a SPILLABLE sort instead of
    * a per-key heap array) and a streaming mapPartitions fold that
    * carries O(1) state per key. The recurrence is inherently
    * sequential, so the fold performs the IDENTICAL IEEE op sequence —
    * results are bit-equal to the exact mode (spec-asserted); the mode
    * trades whole-stage codegen for the unbounded-history bound, and
    * emits `valueField` as double (the fold's arithmetic type). */
  /** Per-key lag/lead feature columns — the forecasting/feature-
    * engineering step that turns an event stream into supervised rows:
    * each positive `n` adds `<value>_lag_n` (the value n rows earlier in
    * the key's `orderFields` order), each negative `n` adds
    * `<value>_lead_n`. Boundary rows get NULLs (no fabricated history).
    * `orderFields` must totally order rows within a key or the features
    * are undefined — same contract as every sequential op here.
    * ONE window partitioning serves every requested offset (Spark reuses
    * the sort), so the corpus shuffles once on the key. */
  def lagFeatures(keys: Seq[String], orderFields: Seq[String],
      valueField: String, lags: Seq[Int])(df: DataFrame): DataFrame = {
    require(keys.nonEmpty, "at least one key required")
    require(orderFields.nonEmpty, "orderFields must totally order each key")
    require(lags.nonEmpty && lags.forall(_ != 0),
      "lags must be non-empty and non-zero (0 is the value itself)")
    require(lags.distinct.size == lags.size, "duplicate lag offsets")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderFields.map(col): _*)
    lags.foldLeft(df) { (d, n) =>
      if (n > 0)
        d.withColumn(s"${valueField}_lag_$n", lag(col(valueField), n).over(w))
      else
        d.withColumn(s"${valueField}_lead_${-n}",
          lead(col(valueField), -n).over(w))
    }
  }

  /** CUSUM mean-shift detector (Page 1954) per key: the two one-sided
    * cumulative statistics
    * `sp_i = max(0, sp_{i-1} + (v_i − target − slack))` and
    * `sn_i = max(0, sn_{i-1} + (target − slack − v_i))` accumulate
    * evidence of an upward/downward mean shift; `shift_flag` fires while
    * either exceeds `threshold`. The streaming-quality-monitor
    * complement to the distributional drift probes: those compare two
    * windows, CUSUM localizes WHEN the level moved within one ordered
    * stream. NULL values update nothing (no evidence either way); NULL
    * timestamps are excluded (temporal doctrine). Exact sequential fold
    * in (ts, tieBreak) order — the [[ewmaSmooth]] machinery: one
    * grouping shuffle, one linear per-key fold, rows explode back with
    * `(cusum_pos, cusum_neg, shift_flag)`. Fixed-order IEEE arithmetic,
    * bit-identical across engines. `exactOrder = false` is the
    * production mode for hub-scale keys: repartition-by-key +
    * in-partition sort + one streaming pass, O(1) memory per key
    * instead of the collected array — parity with the exact fold is
    * spec-pinned (identical arithmetic, different physical plan). */
  def cusumShift(
      keyField: String, tsField: String, valueField: String,
      target: Double, slack: Double, threshold: Double,
      tieBreak: String, exactOrder: Boolean = true)(
      df: DataFrame): DataFrame = {
    require(slack >= 0.0, s"slack must be >= 0, got $slack")
    require(threshold > 0.0, s"threshold must be > 0, got $threshold")
    if (!exactOrder) {
      // production mode (the ewmaSmooth discipline): repartition by key,
      // sort within partitions, one streaming pass — no per-key array
      // materialization, so a hub key costs memory O(1) instead of
      // O(events); ≤1e-12 parity with the exact mode is spec-pinned
      val prepared = df.filter(col(tsField).isNotNull)
        .select(col(keyField).as("__k"), col(tsField).as("__t"),
          col(tieBreak).as("__tb"), col(valueField).cast("double").as("__v"))
        .repartition(col("__k"))
        .sortWithinPartitions("__k", "__t", "__tb")
      val outSchema = org.apache.spark.sql.types.StructType(
        prepared.schema.fields ++ Seq(
          org.apache.spark.sql.types.StructField("cusum_pos",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("cusum_neg",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("shift_flag",
            org.apache.spark.sql.types.BooleanType)))
      val scanned = prepared.mapPartitions { it =>
        var curKey: Any = null
        var started = false
        var sp = 0.0; var sn = 0.0
        it.map { r =>
          val k = r.get(0)
          if (!started || k != curKey) { sp = 0.0; sn = 0.0 }
          curKey = k; started = true
          if (!r.isNullAt(3)) {
            val v = r.getDouble(3)
            sp = math.max(0.0, sp + (v - target - slack))
            sn = math.max(0.0, sn + (target - slack - v))
          }
          org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2),
            if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3)),
            sp, sn, sp > threshold || sn > threshold)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      return scanned.select(col("__k").as(keyField), col("__t").as(tsField),
        col("__tb").as(tieBreak), col("__v").as(valueField),
        col("cusum_pos"), col("cusum_neg"), col("shift_flag"))
    }
    val arr = sort_array(collect_list(
      struct(col("__t"), col("__tb"), col("__v"))))
    val stateType = "array<struct<sp:double,sn:double>>"
    val fold = aggregate(col("__arr"),
      array().cast(stateType),
      (acc, x) => {
        val spPrev = when(size(acc) === 0, lit(0.0))
          .otherwise(element_at(acc, -1).getField("sp"))
        val snPrev = when(size(acc) === 0, lit(0.0))
          .otherwise(element_at(acc, -1).getField("sn"))
        val v = x.getField("__v")
        val sp = when(v.isNull, spPrev).otherwise(
          greatest(lit(0.0), spPrev + (v - lit(target) - lit(slack))))
        val sn = when(v.isNull, snPrev).otherwise(
          greatest(lit(0.0), snPrev + (lit(target) - lit(slack) - v)))
        concat(acc, array(struct(sp.as("sp"), sn.as("sn"))))
      })
    df.filter(col(tsField).isNotNull)
      .select(col(keyField).as("__k"), col(tsField).as("__t"),
        col(tieBreak).as("__tb"), col(valueField).cast("double").as("__v"))
      .groupBy("__k").agg(arr.as("__arr"))
      .withColumn("__st", fold)
      .select(col("__k"), posexplode(arrays_zip(col("__arr"), col("__st"))))
      .select(col("__k").as(keyField),
        col("col.__arr.__t").as(tsField),
        col("col.__arr.__tb").as(tieBreak),
        col("col.__arr.__v").as(valueField),
        col("col.__st.sp").as("cusum_pos"),
        col("col.__st.sn").as("cusum_neg"),
        (col("col.__st.sp") > threshold || col("col.__st.sn") > threshold)
          .as("shift_flag"))
  }

  /** Holt double exponential smoothing — [[ewmaSmooth]]'s
    * trend-aware sibling: per key in (ts, tieBreak) order,
    * `level ← α·x + (1−α)·(level + trend)`,
    * `trend ← β·(level − level_prev) + (1−β)·trend_prev`, seeded
    * level = first value, trend = 0 — the standard drift-following
    * smoother for metrics that RAMP (a level-only EWMA lags a ramp
    * forever; Holt's trend term closes the gap), and its
    * `forecast = level + trend` column is the one-step-ahead
    * prediction drift monitors alarm against. Optional Gardner
    * damping: `phi` ∈ (0, 1] multiplies the CARRIED trend in both
    * recurrences and in the forecast (`level + φ·trend` — at h = 1
    * the φ-geometric sum is one multiply) — the standard fix for
    * trend overshoot on metrics that ramp then plateau; φ = 1 (the
    * default) IS classic Holt, dag-identical (the multiply is
    * skipped, property-spec-pinned).
    *
    * NULL doctrine = [[ewmaSmooth]]: a NULL value (or a NULL-poisoned
    * tail) propagates NULL through level/trend/forecast — a gap
    * poisons the smoother rather than silently skipping (resample
    * first if gaps are expected; [[graft.ops.TemporalOps.resample]]).
    * NULL timestamps drop.
    *
    * `exactOrder = true` (the oracle contract): per-key sorted-array
    * fold — per-key memory O(events), the documented bound.
    * `exactOrder = false` (production): repartition-by-key +
    * sortWithinPartitions + one streaming pass, O(1) state per key —
    * the [[cusumShift]] discipline, bit-identical here (the
    * recurrence itself is order-pinned by the sort either way; the
    * two modes differ only in materialization).
    *
    * Output: key, ts, tieBreak, value, `level, trend, forecast`. */
  def holtSmooth(
      keyField: String, tsField: String, valueField: String,
      alpha: Double, beta: Double,
      tieBreak: String, exactOrder: Boolean = true,
      phi: Double = 1.0)(
      df: DataFrame): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0,
      s"beta must be in [0, 1], got $beta")
    require(phi > 0.0 && phi <= 1.0,
      s"phi must be in (0, 1], got $phi")
    if (!exactOrder) {
      val prepared = df.filter(col(tsField).isNotNull)
        .select(col(keyField).as("__k"), col(tsField).as("__t"),
          col(tieBreak).as("__tb"), col(valueField).cast("double").as("__v"))
        .repartition(col("__k"))
        .sortWithinPartitions("__k", "__t", "__tb")
      val outSchema = org.apache.spark.sql.types.StructType(
        prepared.schema.fields ++ Seq(
          org.apache.spark.sql.types.StructField("level",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("trend",
            org.apache.spark.sql.types.DoubleType)))
      val smoothed = prepared.mapPartitions { it =>
        var curKey: Any = null
        var started = false
        var l: java.lang.Double = null
        var b: java.lang.Double = null
        var first = true
        it.map { r =>
          val k = r.get(0)
          if (!started || k != curKey) { first = true }
          curKey = k; started = true
          val v: java.lang.Double =
            if (r.isNullAt(3)) null
            else java.lang.Double.valueOf(r.getDouble(3))
          if (first) {
            l = v
            b = if (v == null) null else java.lang.Double.valueOf(0.0)
            first = false
          } else if (v == null || l == null) {
            l = null; b = null
          } else {
            val lPrev = l.doubleValue(); val bPrev = b.doubleValue()
            // Gardner damping: phi multiplies the carried trend in
            // BOTH recurrences (phi = 1 is classic Holt, and the
            // multiply is skipped so the dag stays byte-identical)
            val bD = if (phi == 1.0) bPrev else phi * bPrev
            val lNew = alpha * v.doubleValue() +
              (1.0 - alpha) * (lPrev + bD)
            b = java.lang.Double.valueOf(
              beta * (lNew - lPrev) + (1.0 - beta) * bD)
            l = java.lang.Double.valueOf(lNew)
          }
          org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), v, l, b)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      def dampF(c: org.apache.spark.sql.Column) =
        if (phi == 1.0) c else lit(phi) * c
      return smoothed.select(col("__k").as(keyField),
        col("__t").as(tsField), col("__tb").as(tieBreak),
        col("__v").as(valueField), col("level"), col("trend"),
        (col("level") + dampF(col("trend"))).as("forecast"))
    }
    val arr = sort_array(collect_list(
      struct(col("__t"), col("__tb"), col("__v"))))
    val stateType = "array<struct<l:double,b:double>>"
    val fold = aggregate(col("__arr"),
      array().cast(stateType),
      (acc, x) => {
        val v = x.getField("__v")
        val lPrev = element_at(acc, -1).getField("l")
        val bPrev0 = element_at(acc, -1).getField("b")
        // Gardner damping: phi multiplies the carried trend in both
        // recurrences; phi = 1 skips the multiply so the classic dag
        // is byte-identical
        val bPrev = if (phi == 1.0) bPrev0 else lit(phi) * bPrev0
        // lNew spelled once per slot but evaluated identically — the
        // oracle's recursive CTE repeats the same expression
        val lNew = lit(alpha) * v + lit(1.0 - alpha) * (lPrev + bPrev)
        val next = when(size(acc) === 0,
          struct(v.as("l"),
            when(v.isNull, lit(null).cast("double"))
              .otherwise(lit(0.0)).as("b")))
          .otherwise(when(v.isNull || lPrev.isNull,
            struct(lit(null).cast("double").as("l"),
              lit(null).cast("double").as("b")))
            .otherwise(struct(lNew.as("l"),
              (lit(beta) * (lNew - lPrev) + lit(1.0 - beta) * bPrev)
                .as("b"))))
        concat(acc, array(next))
      })
    def damp(c: Column) = if (phi == 1.0) c else lit(phi) * c
    df.filter(col(tsField).isNotNull)
      .select(col(keyField).as("__k"), col(tsField).as("__t"),
        col(tieBreak).as("__tb"), col(valueField).cast("double").as("__v"))
      .groupBy("__k").agg(arr.as("__arr"))
      .withColumn("__st", fold)
      .select(col("__k"), posexplode(arrays_zip(col("__arr"), col("__st"))))
      .select(col("__k").as(keyField),
        col("col.__arr.__t").as(tsField),
        col("col.__arr.__tb").as(tieBreak),
        col("col.__arr.__v").as(valueField),
        col("col.__st.l").as("level"),
        col("col.__st.b").as("trend"),
        (col("col.__st.l") + damp(col("col.__st.b"))).as("forecast"))
  }

  /** Holt–Winters additive triple exponential smoothing —
    * [[holtSmooth]]'s seasonal rung, the forecaster for metrics with
    * a CYCLE (crawl volume by hour-of-day, ingest by day-of-week):
    * Holt's trend term follows a ramp but fights the cycle forever;
    * the seasonal component absorbs it. Per key in (ts, tieBreak)
    * order, with `s⁻ = s_{t−period}` (the slot one full cycle back):
    * `level ← α·(x − s⁻) + (1−α)·(level + trend)`,
    * `trend ← β·(level − level_prev) + (1−β)·trend_prev`,
    * `seasonal ← γ·(x − level) + (1−γ)·s⁻`,
    * and `forecast = level + trend + s_{t+1−period}` is the
    * one-step-ahead prediction drift monitors alarm against.
    * `phi` damps the carried trend exactly as in [[holtSmooth]]
    * (φ = 1 default, dag-identical classic form).
    *
    * Seeding convention, fixed so the oracle can replay it: level =
    * first value, trend = 0, the seasonal ring = `period` zeros — the
    * smoother runs AS Holt for the first cycle and learns the
    * seasonals from the residuals (γ·(x − level) deposits into each
    * slot as it first comes around). Deterministic and assumption-
    * free where the classic first-cycle-mean seeding bakes in a
    * stationarity guess; at monitor horizons the two converge at the
    * rate (1−γ)^cycles.
    *
    * NULL doctrine = [[holtSmooth]]: a NULL value (or NULL-poisoned
    * tail) propagates NULL through level/trend/seasonal/forecast and
    * the ring — a gap poisons the smoother rather than silently
    * skipping a seasonal slot (which would rotate every later slot
    * off by one); resample first
    * ([[graft.ops.TemporalOps.resample]]). NULL timestamps drop.
    *
    * `exactOrder = true` (the oracle contract): per-key sorted-array
    * fold carrying the ring per step — per-key memory
    * O(events·period), the documented bound (period ≤ 64).
    * `exactOrder = false` (production): repartition-by-key +
    * sortWithinPartitions + one streaming pass with an O(period)
    * ring buffer per key — the [[holtSmooth]] discipline,
    * bit-identical (the recurrence is order-pinned by the sort either
    * way; the modes differ only in materialization).
    *
    * Output: key, ts, tieBreak, value,
    * `level, trend, seasonal, forecast`. */
  def holtWinters(
      keyField: String, tsField: String, valueField: String,
      alpha: Double, beta: Double, gamma: Double, period: Int,
      tieBreak: String, exactOrder: Boolean = true,
      phi: Double = 1.0)(
      df: DataFrame): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0,
      s"beta must be in [0, 1], got $beta")
    require(gamma >= 0.0 && gamma <= 1.0,
      s"gamma must be in [0, 1], got $gamma")
    require(phi > 0.0 && phi <= 1.0,
      s"phi must be in (0, 1], got $phi")
    require(period >= 2 && period <= 64,
      s"period must be in [2, 64], got $period")
    if (!exactOrder) {
      val prepared = df.filter(col(tsField).isNotNull)
        .select(col(keyField).as("__k"), col(tsField).as("__t"),
          col(tieBreak).as("__tb"), col(valueField).cast("double").as("__v"))
        .repartition(col("__k"))
        .sortWithinPartitions("__k", "__t", "__tb")
      val outSchema = org.apache.spark.sql.types.StructType(
        prepared.schema.fields ++ Seq("level", "trend", "seasonal",
          "forecast").map(n => org.apache.spark.sql.types.StructField(
            n, org.apache.spark.sql.types.DoubleType)))
      val smoothed = prepared.mapPartitions { it =>
        var curKey: Any = null
        var started = false
        var l: java.lang.Double = null
        var b: java.lang.Double = null
        var ring: Array[Double] = null // head at `idx`, poisoned -> null
        var idx = 0
        var first = true
        it.map { r =>
          val k = r.get(0)
          if (!started || k != curKey) { first = true }
          curKey = k; started = true
          val v: java.lang.Double =
            if (r.isNullAt(3)) null
            else java.lang.Double.valueOf(r.getDouble(3))
          var s: java.lang.Double = null
          if (first) {
            first = false
            if (v == null) { l = null; b = null; ring = null }
            else {
              l = v; b = java.lang.Double.valueOf(0.0)
              s = java.lang.Double.valueOf(0.0)
              ring = new Array[Double](period); idx = 0
            }
          } else if (v == null || l == null) {
            l = null; b = null; ring = null
          } else {
            val sm = ring(idx)
            val lPrev = l.doubleValue(); val bPrev0 = b.doubleValue()
            // Gardner damping (the holtSmooth convention): phi scales
            // the carried trend; phi = 1 skips the multiply
            val bPrev = if (phi == 1.0) bPrev0 else phi * bPrev0
            val lNew = alpha * (v.doubleValue() - sm) +
              (1.0 - alpha) * (lPrev + bPrev)
            val bNew = beta * (lNew - lPrev) + (1.0 - beta) * bPrev
            val sNew = gamma * (v.doubleValue() - lNew) + (1.0 - gamma) * sm
            ring(idx) = sNew // the slot one cycle back is overwritten
            idx = (idx + 1) % period
            l = java.lang.Double.valueOf(lNew)
            b = java.lang.Double.valueOf(bNew)
            s = java.lang.Double.valueOf(sNew)
          }
          val f: java.lang.Double =
            if (l == null || ring == null) null
            else java.lang.Double.valueOf(
              l.doubleValue() +
                (if (phi == 1.0) b.doubleValue()
                 else phi * b.doubleValue()) + ring(idx))
          org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), v,
            l, b, s, f)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      return smoothed.select(col("__k").as(keyField),
        col("__t").as(tsField), col("__tb").as(tieBreak),
        col("__v").as(valueField), col("level"), col("trend"),
        col("seasonal"), col("forecast"))
    }
    val arr = sort_array(collect_list(
      struct(col("__t"), col("__tb"), col("__v"))))
    val stateType =
      "array<struct<l:double,b:double,s:double,q:array<double>>>"
    val nullQ = lit(null).cast("array<double>")
    val fold = aggregate(col("__arr"),
      array().cast(stateType),
      (acc, x) => {
        val v = x.getField("__v")
        val prev = element_at(acc, -1)
        val lPrev = prev.getField("l")
        val bPrev0 = prev.getField("b")
        // Gardner damping (the holtSmooth convention); phi = 1 skips
        // the multiply so the classic dag is byte-identical
        val bPrev = if (phi == 1.0) bPrev0 else lit(phi) * bPrev0
        val qPrev = prev.getField("q")
        val sm = element_at(qPrev, 1)
        // lNew spelled once per slot but evaluated identically — the
        // oracle's recursive CTE repeats the same expression
        val lNew = lit(alpha) * (v - sm) +
          lit(1.0 - alpha) * (lPrev + bPrev)
        val bNew = lit(beta) * (lNew - lPrev) + lit(1.0 - beta) * bPrev
        val sNew = lit(gamma) * (v - lNew) + lit(1.0 - gamma) * sm
        val next = when(size(acc) === 0,
          when(v.isNull, struct(lit(null).cast("double").as("l"),
            lit(null).cast("double").as("b"),
            lit(null).cast("double").as("s"), nullQ.as("q")))
            .otherwise(struct(v.as("l"), lit(0.0).as("b"),
              lit(0.0).as("s"),
              array_repeat(lit(0.0), period).as("q"))))
          .otherwise(when(v.isNull || lPrev.isNull,
            struct(lit(null).cast("double").as("l"),
              lit(null).cast("double").as("b"),
              lit(null).cast("double").as("s"), nullQ.as("q")))
            .otherwise(struct(lNew.as("l"), bNew.as("b"), sNew.as("s"),
              concat(slice(qPrev, 2, period - 1), array(sNew)).as("q"))))
        concat(acc, array(next))
      })
    df.filter(col(tsField).isNotNull)
      .select(col(keyField).as("__k"), col(tsField).as("__t"),
        col(tieBreak).as("__tb"), col(valueField).cast("double").as("__v"))
      .groupBy("__k").agg(arr.as("__arr"))
      .withColumn("__st", fold)
      .select(col("__k"), posexplode(arrays_zip(col("__arr"), col("__st"))))
      .select(col("__k").as(keyField),
        col("col.__arr.__t").as(tsField),
        col("col.__arr.__tb").as(tieBreak),
        col("col.__arr.__v").as(valueField),
        col("col.__st.l").as("level"),
        col("col.__st.b").as("trend"),
        col("col.__st.s").as("seasonal"),
        (col("col.__st.l") +
          (if (phi == 1.0) col("col.__st.b")
           else lit(phi) * col("col.__st.b")) +
          element_at(col("col.__st.q"), 1)).as("forecast"))
  }

  /** Rolling Pearson correlation between two measures over the last
    * `window` rows per key — the co-movement monitor (does price still
    * track quantity? does latency still track load?) whose BREAK is
    * the alarm, next to [[cusumShift]]'s level shifts. Exactness
    * discipline: both measures quantize to 1e-9 (the money-column
    * rule), every windowed sum is an exact decimal(38,0) of scaled
    * integers, and the correlation assembles as
    * `(n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) · √(n·Syy − Sy²))` — exact
    * integers into two correctly-rounded sqrts, one multiply, one
    * divide; the 1e9 scale factors cancel. Full frames only: rows
    * before the window fills report NULL `corr` (a 3-row "window" of
    * a 20-row contract is noise, not signal); zero variance on either
    * side → NULL (undefined, not ±1). Rows with NULL in either
    * measure are dropped UP FRONT (the frame contract is "last n
    * observed pairs", not "last n rows"); NULL-safe by construction
    * after that. ONE window shuffle, O(window) state per row, no
    * per-key arrays. Order must be made total by `orderFields`
    * (include the measures themselves when the natural key can tie —
    * identical full rows then commute harmlessly). Output: keys ++
    * orderFields ++ (x, y, n, corr).
    *
    * The exact mode's frame sums ride CUMSUM-MINUS-LAG (window-
    * independent O(1)/row — see the in-code note; measured FLAT in
    * window at sf0.1, 4.4/4.3/4.0 s for windows 10/20/40).
    *
    * `exact = false` is the production knob (the percentile family's
    * `approx = true` doctrine): bounded sliding frames over plain
    * doubles — no 1e-9 quantization, no decimal arithmetic, and no
    * cumulative growth, so it has no series-length bound.
    * Agreement is within ~1e-12 relative on well-conditioned data
    * (spec-pinned vs the exact mode); the exact decimal default
    * remains the oracle form because double sums are
    * accumulation-order-sensitive and a monitor threshold should not
    * flap across engines. */
  def rollingCorr(
      keys: Seq[String], orderFields: Seq[String],
      xField: String, yField: String, window: Int,
      exact: Boolean = true)(
      df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 2 && window <= 10000,
      s"window must be in [2, 10000], got $window")
    require(orderFields.nonEmpty, "at least one order column")
    // CUMSUM-MINUS-LAG frame sums, not bounded sliding frames: Spark's
    // SlidingWindowFunctionFrame rebuilds the aggregate buffer every
    // time the lower bound moves (no inverse aggregation), so a
    // bounded frame costs O(window) per row — with six decimal
    // aggregates that made this the #2 bench cell. A RUNNING frame is
    // incremental O(1)/row and `lag(cum, window)` recovers the exact
    // frame sum as one integer subtraction: cum_t − cum_{t−window} IS
    // Σ over the last `window` rows, value-identical (exact integer
    // arithmetic — no float cancellation is possible), so the oracle
    // and all outputs are bit-for-bit unchanged. The trade, stated:
    // cumulative Σx² grows with SERIES length, not window — the
    // decimal(38,0) headroom supports ~10⁸ rows per key at |x| ≈ 1e6
    // (vs the old window-bounded form); longer per-key series at that
    // magnitude belong on `exact = false` anyway, and the bound is
    // ENFORCED, not just stated: a cumulative sum that overflows to
    // NULL raises (see `checked` below) instead of aliasing the
    // legitimate NULL outputs.
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderFields.map(col): _*)
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sliding = ord.rowsBetween(-(window - 1), Window.currentRow)
    def q9(c: Column) =
      if (exact) round(c.cast("double") * 1e9, 0).cast("decimal(19,0)")
      else c.cast("double")
    def sq(c: Column) =
      if (exact) (c * c).cast("decimal(38,0)") else c * c
    def xy(c1: Column, c2: Column) =
      if (exact) (c1 * c2).cast("decimal(38,0)") else c1 * c2
    val quantized = df
      .filter(col(xField).isNotNull && col(yField).isNotNull)
      .withColumn("__x9", q9(col(xField)))
      .withColumn("__y9", q9(col(yField)))
    val (base, n, sx, sy, sxx, syy, sxy) = if (exact) {
      // pass 1: running sums + row counter (one incremental WindowExec);
      // pass 2 (same sort, no new shuffle): frame = cum − lag(cum, w) —
      // exact integers, so the subtraction IS the frame sum bit-for-bit
      val b = quantized
        .withColumn("__rn", row_number().over(ord))
        .withColumn("__cx", sum(col("__x9")).over(cum))
        .withColumn("__cy", sum(col("__y9")).over(cum))
        .withColumn("__cxx", sum(sq(col("__x9"))).over(cum))
        .withColumn("__cyy", sum(sq(col("__y9"))).over(cum))
        .withColumn("__cxy", sum(xy(col("__x9"), col("__y9"))).over(cum))
      // overflow fail-fast: x/y are non-null by the up-front filter, so
      // a NULL cumulative sum has exactly one cause — the non-ANSI
      // decimal(38,0) sum overflowed (past ~10⁸ rows/key at |x|≈1e6).
      // Without this guard the overflow-NULL would alias the legitimate
      // zero-variance/partial-frame NULLs and corr would silently read
      // NULL mid-series; raise_error instead steers the caller to
      // exact=false (bounded frames, no cumulative growth).
      def checked(c: Column) = when(c.isNull, raise_error(lit(
        "rollingCorr(exact=true): decimal(38,0) cumulative sum " +
          "overflowed (series too long for the exact mode's headroom); " +
          "use exact=false for unbounded series length"))
        .cast("decimal(38,0)")).otherwise(c)
      def frame(c: Column) = checked(c) - coalesce(
        lag(checked(c), window).over(ord), lit(0).cast("decimal(38,0)"))
      (b, least(col("__rn"), lit(window)).cast("long"),
        frame(col("__cx")), frame(col("__cy")), frame(col("__cxx")),
        frame(col("__cyy")), frame(col("__cxy")))
    } else {
      // the double mode keeps the bounded sliding frame: cum − lag on
      // FLOATS is not the frame sum (cancellation grows with series
      // length), and double frame rebuilds are cheap
      (quantized, count(lit(1)).over(sliding),
        sum(col("__x9")).over(sliding), sum(col("__y9")).over(sliding),
        sum(sq(col("__x9"))).over(sliding),
        sum(sq(col("__y9"))).over(sliding),
        sum(xy(col("__x9"), col("__y9"))).over(sliding))
    }
    val num = (n * sxy - sx * sy).cast("double")
    val vx = (n * sxx - sx * sx).cast("double")
    val vy = (n * syy - sy * sy).cast("double")
    base
      .withColumn("n", n)
      .withColumn("corr",
        when(col("n") < window, lit(null).cast("double"))
          .otherwise(when(vx <= 0.0 || vy <= 0.0,
            lit(null).cast("double"))
            .otherwise(num / (sqrt(vx) * sqrt(vy)))))
      .select((keys ++ orderFields ++ Seq(xField, yField)).distinct
        .map(col) ++ Seq(col("n"), col("corr")): _*)
  }

  def ewmaSmooth(
      keyField: String, tsField: String, valueField: String, alpha: Double,
      tieBreak: String, exactOrder: Boolean = true)(df: DataFrame): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    val beta = 1.0 - alpha
    if (!exactOrder) {
      val prepared = df.filter(col(tsField).isNotNull)
        .select(col(keyField).as("__k"), col(tsField).as("__t"),
          col(tieBreak).as("__tb"), col(valueField).cast("double").as("__v"))
        .repartition(col("__k"))
        .sortWithinPartitions("__k", "__t", "__tb")
      val outSchema = org.apache.spark.sql.types.StructType(
        prepared.schema.fields :+ org.apache.spark.sql.types.StructField(
          "ewma", org.apache.spark.sql.types.DoubleType))
      val smoothed = prepared.mapPartitions { it =>
        // one running (key, prevEwma) cell — partition order IS
        // (key, ts, tieBreak) order by construction above
        var curKey: Any = null
        var started = false
        var prev: java.lang.Double = null
        it.map { r =>
          val k = r.get(0)
          val v: java.lang.Double =
            if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))
          val e: java.lang.Double =
            if (!started || k != curKey) v
            // NULL value or a NULL-poisoned tail: propagate, the exact
            // mode's Catalyst null semantics
            else if (v == null || prev == null) null
            else java.lang.Double.valueOf(
              alpha * v.doubleValue() + beta * prev.doubleValue())
          curKey = k; started = true; prev = e
          org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), v, e)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      return smoothed.select(col("__k").as(keyField), col("__t").as(tsField),
        col("__tb").as(tieBreak), col("__v").as(valueField), col("ewma"))
    }
    val arr = sort_array(collect_list(
      struct(col("__t"), col("__tb"), col("__v"))))
    val fold = aggregate(col("__arr"),
      array().cast("array<double>"),
      (acc, x) => when(size(acc) === 0, array(x("__v")))
        .otherwise(concat(acc,
          array(lit(alpha) * x("__v") + lit(beta) * element_at(acc, -1)))))
    df.filter(col(tsField).isNotNull)
      .select(col(keyField).as("__k"), col(tsField).as("__t"),
        col(tieBreak).as("__tb"), col(valueField).as("__v"))
      .groupBy("__k").agg(arr.as("__arr"))
      .withColumn("__sm", fold)
      .select(col("__k"), posexplode(arrays_zip(col("__arr"), col("__sm"))))
      .select(col("__k").as(keyField),
        col("col.__arr.__t").as(tsField),
        col("col.__arr.__tb").as(tieBreak),
        col("col.__arr.__v").as(valueField),
        col("col.__sm").as("ewma"))
  }

  /** Kaplan–Meier product-limit retention curve per group (Kaplan &
    * Meier 1958) — the retention table every events pipeline wants:
    * per distinct event time t, with d_t deaths (churns, failures) and
    * n_t subjects still at risk,
    *   `S(t) = Π_{t' ≤ t} (1 − d_{t'}/n_{t'})`
    * — the survival probability that respects CENSORING: a censored
    * subject (still active when observation ended, `censored` true)
    * leaves the risk set at its time without counting as a death, so
    * the curve is not biased down by subjects the window simply hasn't
    * finished watching. Also reports Greenwood's standard error
    *   `se(t) = S(t)·√(Σ_{t'≤t} d/(n(n−d)))`
    * (one sqrt — the no-libm doctrine's CI companion) and the
    * Nelson–Aalen cumulative hazard `H(t) = Σ_{t'≤t} d/n` (the
    * additive view of the same curve — defined even at d = n, where
    * Greenwood is not; at 100 TB scale the log-free identity
    * S ≈ e^−H is the caller's to apply).
    *
    * Exactness: d_t, c_t, and the at-risk counts are exact integers
    * (n_t folds as `n_{t-1} − d − c`, seeded at the group total); the
    * survival product and the Greenwood sum are TIME-PINNED float
    * folds over the sorted distinct-time cells (the [[holtSmooth]]
    * fold discipline — per-step one division, one multiply; the
    * DuckDB oracle replays the identical recurrence as a recursive
    * CTE). A time where d = n (the whole remaining risk set dies)
    * reads survival 0 and NULL-poisons `se` from there on (the
    * Greenwood term divides by n−d — honest undefined, not Infinity).
    * NULL time/censored rows drop (a subject with unknown censoring
    * status is not evidence).
    *
    * Scale shape: one hash-agg to (group, time) cells, then ONE
    * collect_list fold over the group's DISTINCT TIMES — the
    * [[holtSmooth]] grouped-sequence cost class; quantize time (day
    * buckets) so the per-group sequence stays bounded. Output per
    * (group, time):
    * `t, n_risk, n_death, n_censor, survival, se, cum_hazard`. */
  def kaplanMeier(time: Column, censored: Column,
      groupCols: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    val grp = groupCols.map(col)
    val base = df.filter(time.isNotNull && censored.isNotNull)
      .select(grp :+ time.as("__t") :+
        censored.cast("boolean").as("__c"): _*)
    val cells = base.groupBy(grp :+ col("__t"): _*)
      .agg(sum(when(!col("__c"), 1L).otherwise(0L)).as("__d"),
        sum(when(col("__c"), 1L).otherwise(0L)).as("__cn"))
    val arr = sort_array(collect_list(
      struct(col("__t"), col("__d"), col("__cn"))))
    val perGrp =
      (if (grp.isEmpty) cells.groupBy() else cells.groupBy(grp: _*))
        .agg(arr.as("__arr"), sum(col("__d") + col("__cn")).as("__n0"))
    val stateType = "array<struct<nr:bigint,d:bigint,cn:bigint," +
      "s:double,gv:double,ch:double>>"
    val fold = aggregate(col("__arr"), array().cast(stateType),
      (acc, x) => {
        val prev = element_at(acc, -1)
        // at-risk folds exactly: group total, minus everything that
        // died or censored at earlier times
        val nr = when(size(acc) === 0, col("__n0"))
          .otherwise(prev.getField("nr") - prev.getField("d") -
            prev.getField("cn"))
        val sPrev = when(size(acc) === 0, lit(1.0))
          .otherwise(prev.getField("s"))
        val gPrev = when(size(acc) === 0, lit(0.0))
          .otherwise(prev.getField("gv"))
        val chPrev = when(size(acc) === 0, lit(0.0))
          .otherwise(prev.getField("ch"))
        val d = x.getField("__d")
        val factor = lit(1.0) - d.cast("double") / nr.cast("double")
        // d = n: survival hits exactly 0; the Greenwood term is
        // undefined (division by n−d) — NULL poisons the rest
        val gTerm = when(d < nr, d.cast("double") /
          (nr.cast("double") * (nr - d).cast("double")))
        concat(acc, array(struct(nr.as("nr"), d.as("d"),
          x.getField("__cn").as("cn"),
          (sPrev * factor).as("s"), (gPrev + gTerm).as("gv"),
          // Nelson–Aalen cumulative hazard rides the same fold: one
          // extra division per step, defined even where Greenwood is
          // not (d = n is hazard 1, not undefined)
          (chPrev + d.cast("double") / nr.cast("double")).as("ch"))))
      })
    perGrp.withColumn("__st", fold)
      .select(grp :+ posexplode(arrays_zip(col("__arr"), col("__st"))): _*)
      .select(grp ++ Seq(col("col.__arr.__t").as("t"),
        col("col.__st.nr").as("n_risk"),
        col("col.__arr.__d").as("n_death"),
        col("col.__arr.__cn").as("n_censor"),
        col("col.__st.s").as("survival"),
        when(col("col.__st.gv").isNotNull,
          col("col.__st.s") * sqrt(col("col.__st.gv"))).as("se"),
        col("col.__st.ch").as("cum_hazard")): _*)
  }

  /** Survival quantile per group — the "median lifetime" readout off
    * [[kaplanMeier]]'s curve: the smallest time t with
    * `S(t) ≤ 1 − q` (q = 0.5 is median survival — when has half the
    * cohort churned?). Censoring-aware by construction. The
    * comparison runs on the SAME pinned survival doubles both engines
    * compute, so the crossing time is deterministic cross-engine. A
    * curve that never drops to 1−q (more than 1−q of the cohort still
    * alive at the last observed time) reads NULL t honestly — "the
    * median lifetime exceeds the observation window" is a finding,
    * not a default. NULL doctrine and scale shape = [[kaplanMeier]]
    * plus one filter and one min. Output per group: `n, q, t`. */
  def survivalQuantile(time: Column, censored: Column, q: Double = 0.5,
      groupCols: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0, 1), got $q")
    val grp = groupCols.map(col)
    val km = kaplanMeier(time, censored, groupCols)(df)
    // ONE aggregation over the KM frame: min over an all-NULL `when`
    // reads NULL — the honest "never crossed" (review-caught: a
    // two-agg + join shape planned the whole KM subtree twice)
    (if (grp.isEmpty) km.groupBy() else km.groupBy(grp: _*))
      .agg(sum(col("n_death") + col("n_censor")).as("n"),
        min(when(col("survival") <= lit(1.0 - q), col("t"))).as("__tq"))
      .select(grp ++ Seq(col("n"), lit(q).as("q"),
        col("__tq").as("t")): _*)
  }

  /** Restricted mean survival time per group — the single retention
    * NUMBER beside [[kaplanMeier]]'s curve: the area under the KM step
    * function up to the horizon `tau`,
    *   `RMST(τ) = Σ_i S(t_{i−1})·(min(t_i, τ) − t_{i−1}) +
    *              S(t_last)·(τ − min(t_last, τ))`
    * — "the average days retained within a τ-day window", the number a
    * dashboard wants where the full curve is a chart. Censoring-aware
    * by construction (it integrates the KM estimate). Exactness: the
    * segment products ride [[kaplanMeier]]'s pinned survival values
    * and exact time gaps, summed as a time-pinned fold
    * (`exactOrder=false` = plain sum); the oracle replays the same
    * lag/clip/fold. Times must be ≥ 0 (the origin is 0; a negative
    * time raises loudly). NULL doctrine = [[kaplanMeier]]. Scale shape
    * = [[kaplanMeier]] plus one lag window and one fold over distinct
    * times. Output per group: `n, tau, rmst`. */
  def rmst(time: Column, censored: Column, tau: Double,
      groupCols: Seq[String] = Nil,
      exactOrder: Boolean = true)(df: DataFrame): DataFrame = {
    require(tau > 0.0, s"tau must be positive, got $tau")
    val grp = groupCols.map(col)
    val km = kaplanMeier(time, censored, groupCols)(df)
    val w = Window.partitionBy(grp: _*).orderBy(col("t"))
    val tD = when(col("t").cast("double") < 0.0, raise_error(concat(
      lit("rmst: negative time "), col("t").cast(
        org.apache.spark.sql.types.StringType),
      lit(" — times measure from origin 0"))).cast("double"))
      .otherwise(col("t").cast("double"))
    val prevS = lag(col("survival"), 1, 1.0).over(w)
    val prevT = coalesce(lag(col("t").cast("double"), 1).over(w),
      lit(0.0))
    val isLast = lead(col("t"), 1).over(w).isNull
    val tauL = lit(tau)
    val seg = prevS * (least(tD, tauL) - least(prevT, tauL)) +
      when(isLast, col("survival") * (tauL - least(tD, tauL)))
        .otherwise(lit(0.0))
    val withSeg = km.withColumn("__seg", seg)
    val fold =
      if (exactOrder)
        aggregate(
          sort_array(collect_list(struct(col("t").as("__k"),
            col("__seg").as("__v")))),
          lit(0.0), (acc, x) => acc + x.getField("__v"))
      else sum(col("__seg"))
    (if (grp.isEmpty) withSeg.groupBy() else withSeg.groupBy(grp: _*))
      .agg(sum(col("n_death") + col("n_censor")).as("n"),
        fold.as("__rmst"))
      .select(grp ++ Seq(col("n"), lit(tau).as("tau"),
        col("__rmst").as("rmst")): _*)
  }
}
