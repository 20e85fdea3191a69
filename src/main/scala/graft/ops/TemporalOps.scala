package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Temporal join operators — absent from the reference (SURVEY.md §2.4
  * lists them as extension-surface joins Spark lacks as built-ins) but
  * essential for event/time-series pipelines at scale.
  *
  * Both operators avoid the naive broadcast-nested-loop / cross-join plan
  * a non-equi condition would otherwise produce:
  *
  *  - [[asOfJoin]] is the union + ordered-window technique: one shuffle of
  *    each side on the join key, a per-key sort, and `last(_, ignoreNulls)`
  *    carries the most recent right row forward — O(n log n) per key,
  *    never O(n²).
  *  - [[bandJoin]] buckets both sides by `floor(time / width)` so a band
  *    predicate `0 <= rightTime - leftTime <= width` becomes an equi-join
  *    on (key, bucket) with the left side exploded into its two candidate
  *    buckets — the shuffle key carries the time bucket, so skew is bounded
  *    by bucket population, not by key population.
  */
object TemporalOps {

  /** As-of join: for every left row, attach the nearest right row of the
    * same `key` — `direction = "backward"` (default): the LATEST right
    * with `rightTime <= leftTime`; `direction = "forward"`: the EARLIEST
    * right with `rightTime >= leftTime` (both inclusive);
    * `direction = "nearest"`: whichever of those two candidates sits
    * closer in time, EQUIDISTANT ties to the backward one (the Pandas
    * `merge_asof` direction set). Nearest requires TIMESTAMP time
    * columns (distances compare in epoch micros) and costs one extra
    * per-key sort over the SAME single shuffle — both directional
    * passes run inside one partitioning.
    * `toleranceSeconds` additionally bounds the match distance
    * (|leftTime − matchedTime| ≤ tolerance, timestamps required) — a
    * too-distant match comes back as NULLs, the Pandas/kdb `tolerance`
    * contract.
    *
    * Implementation (SURVEY.md §2.4): union both sides tagged
    * (right=0, left=1), window per key ordered by
    * (time ASC, side ASC, rightTieBreak ASC) in a ROWS UNBOUNDED
    * PRECEDING frame, and take `last(rightStruct, ignoreNulls)`. Ordering
    * right before left at equal timestamps makes the match inclusive; the
    * tie-break makes the winning right row deterministic when right rows
    * share a timestamp. Left rows with no prior right row get NULLs.
    * The forward direction is the same plan on the REVERSED time axis
    * (time DESC), so among equal-timestamp right rows the SMALLER
    * tie-break wins there (later-wins backward, earlier-wins forward —
    * both documented, both mirrored in the oracle).
    *
    * Scale: one shuffle per side on `key`, spillable sort — the same cost
    * as a single window aggregation; no non-equi join is ever planned.
    * The tolerance is a pure post-projection on the matched struct (the
    * matched timestamp rides the struct) — no extra join or window.
    *
    * @param rightVals right columns carried onto left rows, emitted as
    *                  `<prefix><col>`.
    * @param rightTieBreak right column ordering among right rows with
    *                      equal timestamps (must be unique per
    *                      (key, time) for determinism).
    */
  def asOfJoin(
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      rightTieBreak: String,
      prefix: String = "asof_",
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None)(left: DataFrame): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be 'backward', 'forward' or 'nearest', got '$direction'")
    if (direction == "nearest")
      require(left.schema(leftTime).dataType ==
          org.apache.spark.sql.types.TimestampType &&
        right.schema(rightTime).dataType ==
          org.apache.spark.sql.types.TimestampType,
        "direction = 'nearest' compares distances in epoch micros and " +
          "requires TIMESTAMP time columns on both sides")
    require(toleranceSeconds.forall(_ >= 0L), "tolerance must be >= 0")
    // the matched timestamp rides the carried struct under a reserved
    // name so the tolerance can compare against it
    val mtField = "__graft_mt"
    require(!rightVals.contains(mtField), s"'$mtField' is reserved")
    val rvStruct = StructType(rightVals.map(c => right.schema(c)) :+
      StructField(mtField, right.schema(rightTime).dataType))
    val tbType = right.schema(rightTieBreak).dataType
    val r = right
      // a right row with a NULL timestamp can never satisfy rt <= lt;
      // unfiltered it would sort first (nulls first) and masquerade as
      // the "earliest" match
      .filter(col(rightTime).isNotNull)
      .select(
        col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        // keep the tie-break's NATIVE type: a string cast would order
        // numeric ids lexicographically ("10" < "9")
        col(rightTieBreak).as("__tb"),
        struct(rightVals.map(col) :+ col(rightTime).as(mtField): _*).as("__rv"),
        lit(null).cast(StructType(left.schema.fields)).as("__lrow"))
    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(tbType).as("__tb"),
      lit(null).cast(rvStruct).as("__rv"),
      struct(left.columns.map(col): _*).as("__lrow"))
    // forward = backward on the reversed time axis; null-ts left rows
    // must sort FIRST either way (before any right row) so they match
    // nothing
    val wb = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc_nulls_first, col("__side").asc,
        col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc_nulls_first, col("__side").asc,
        col("__tb").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val union = r.unionByName(l)
    val matched = (direction match {
      case "backward" =>
        union.withColumn("__m", last(col("__rv"), ignoreNulls = true).over(wb))
      case "forward" =>
        union.withColumn("__m", last(col("__rv"), ignoreNulls = true).over(wf))
      case _ => // nearest: both passes share the one (key) partitioning,
        // then the closer candidate wins, equidistant ties backward
        val withBoth = union
          .withColumn("__mb", last(col("__rv"), ignoreNulls = true).over(wb))
          .withColumn("__mf", last(col("__rv"), ignoreNulls = true).over(wf))
        val db = unix_micros(col("__t")) -
          unix_micros(col(s"__mb.$mtField"))
        val df_ = unix_micros(col(s"__mf.$mtField")) -
          unix_micros(col("__t"))
        withBoth.withColumn("__m",
          when(col("__mb").isNull, col("__mf"))
            .when(col("__mf").isNull, col("__mb"))
            .when(db <= df_, col("__mb")).otherwise(col("__mf")))
          .drop("__mb", "__mf")
    }).filter(col("__side") === 1)
    val keep = toleranceSeconds match {
      case None => col("__m").isNotNull
      case Some(tol) => col("__m").isNotNull &&
        abs(unix_micros(col("__t")) - unix_micros(col(s"__m.$mtField"))) <=
          tol * 1000000L
    }
    val leftCols = left.columns.map(c => col(s"__lrow.$c").as(c))
    val rightCols = rightVals.map(c =>
      when(keep, col(s"__m.$c")).as(s"$prefix$c"))
    matched.select(leftCols ++ rightCols: _*)
  }

  /** Leakage-safe TEMPORAL train/test split — the time-series sibling
    * of [[graft.ext.Dedup.clusterSafeSplit]]'s content-hash split: rows
    * before `cutoff` label `train`, rows at least `embargoSeconds`
    * after it label `test`, and the embargo gap between labels
    * `embargo` (excluded from both sides so windowed features computed
    * near the boundary cannot leak future information into training —
    * the purged/embargoed-split discipline of financial ML). NULL
    * timestamps label NULL — an undatable row belongs to neither side.
    * Pure projection; `cutoff` is a UTC timestamp string. */
  def temporalSplit(
      tsField: String, cutoff: String, embargoSeconds: Long = 0L)(
      df: DataFrame): DataFrame = {
    require(embargoSeconds >= 0L, "embargo must be >= 0")
    val cut = to_timestamp(lit(cutoff))
    // NTZ-tolerant: fixture/raw feeds carry TIMESTAMP_NTZ, which
    // unix_micros rejects — compare on the session-zone cast
    val t = col(tsField).cast("timestamp")
    df.withColumn("split",
      when(t.isNull, lit(null).cast("string"))
        .when(t < cut, lit("train"))
        .when(unix_micros(t) >=
          unix_micros(cut) + embargoSeconds * 1000000L, lit("test"))
        .otherwise(lit("embargo")))
  }

  /** Type-2 slowly-changing-dimension history from a change stream: for
    * each `key`, order changes by (`ts`, `tieBreak`), drop rows whose
    * tracked `attrs` are unchanged from the previous row (null-safely —
    * the change-compression step of a classic SCD2 load), and emit each
    * surviving version with its validity interval:
    * `valid_from` = its own timestamp, `valid_to` = the NEXT version's
    * timestamp (NULL = still current), `is_current` 0/1 BIGINT. The
    * batch-build form of the warehouse dimension-versioning pattern;
    * [[asOfJoin]] is its read side (attach the version valid at an
    * event's time).
    *
    * Rows with a NULL timestamp are dropped — an undatable change has no
    * place on a validity timeline (same doctrine as [[asOfJoin]]'s right
    * side). `tieBreak` must be unique per (key, ts) for deterministic
    * compression when changes share a timestamp.
    *
    * Scale shape: two windows over the same (key) partitioning and
    * (ts, tieBreak) order — one for change compression (lag), one for
    * interval closing (lead) on the compressed survivors. Both plan one
    * shuffle on `key` with spillable in-partition sorts; per-key history
    * length bounds window memory. No join anywhere. */
  def scd2History(
      key: String, ts: String, attrs: Seq[String], tieBreak: String)(
      df: DataFrame): DataFrame = {
    require(attrs.nonEmpty, "at least one tracked attribute required")
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc_nulls_first, col("__tb").asc_nulls_first)
    val src = df.filter(col(ts).isNotNull)
      .select(col(key).as("__k"), col(ts).as("__t"),
        col(tieBreak).as("__tb"), struct(attrs.map(col): _*).as("__a"))
    val kept = src
      .withColumn("__prev", lag(col("__a"), 1).over(w))
      // null-safe struct compare: a version whose attrs all match the
      // previous row (NULLs included) is not a change
      .filter(col("__prev").isNull || !(col("__a") <=> col("__prev")))
    kept
      .withColumn("__vt", lead(col("__t"), 1).over(w))
      .select(col("__k").as(key) +:
        attrs.map(c => col(s"__a.$c").as(c)) :+
        col("__t").as("valid_from") :+
        col("__vt").as("valid_to") :+
        when(col("__vt").isNull, lit(1L)).otherwise(lit(0L)).as("is_current"): _*)
  }

  /** Apply a change-data-capture batch to a current snapshot — the
    * batch MERGE/upsert primitive (SCD type 1: latest wins, no
    * history; [[scd2History]] is the history-keeping sibling). Per key,
    * the LATEST change by (`ts`, `tieBreak`) decides: an upsert
    * replaces (or inserts) the key's row, a delete removes it;
    * untouched snapshot keys pass through. Emits the new snapshot with
    * the snapshot's column set (`opField`/`ts`/`tieBreak` are change
    * metadata, dropped on the way out).
    *
    * `opField` values: `"U"` upsert, `"D"` delete (anything else is
    * rejected row-wise at plan construction via a constraint column —
    * unknown ops must not silently drop). Changes with NULL timestamps
    * are dropped (undatable — the temporal doctrine); earlier changes
    * for a key are superseded entirely, INCLUDING earlier deletes (a
    * delete then an upsert re-creates the key — last-wins semantics all
    * the way down, matching warehouse MERGE).
    *
    * Scale shape: one WindowGroupLimit top-1 over the CHANGE batch
    * (small by definition), one hash anti-join of the snapshot against
    * the change keys, one union — the snapshot is never sorted and
    * never shuffled beyond the anti-join; with a bucketed snapshot
    * layout ([[graft.sources.CatalogStore]]) even that shuffle
    * disappears. */
  def applyChanges(
      changes: DataFrame,
      key: String,
      ts: String,
      tieBreak: String,
      opField: String)(snapshot: DataFrame): DataFrame = {
    val dataCols = snapshot.columns
    val latest = changes
      // NULL-key changes are unaddressable (the anti-join could never
      // remove what an upsert would insert — a duplicate NULL-key row);
      // NULL timestamps are undatable — both drop, the library doctrine
      .filter(col(ts).isNotNull && col(key).isNotNull)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(key))
          .orderBy(col(ts).desc, col(tieBreak).desc)))
      .filter(col("__rk") === 1)
      .drop("__rk")
    // the op guard is FUSED into the key expression the anti-join needs,
    // so column pruning cannot elide it: a change row with an op outside
    // the contract throws instead of silently acting as a delete
    val changedKeys = latest.select(
      when(col(opField).isin("U", "D"), col(key))
        .otherwise(raise_error(concat(lit("applyChanges: unknown op '"),
          col(opField), lit("'")))).as(key)).distinct()
    val kept = snapshot.join(changedKeys, Seq(key), "left_anti")
    val upserts = latest.filter(col(opField) === "U")
      .select(dataCols.map(col): _*)
    kept.unionByName(upserts)
  }

  /** Band (range) join: pairs of (left, right) rows with the same `key`
    * where `0 <= rightTime - leftTime <= widthSeconds` (both inclusive).
    *
    * Implementation: both sides bucket by `floor(epochSeconds / width)`;
    * a qualifying right row lives in the left row's bucket or the next
    * one, so the left side is exploded into those two candidate buckets
    * and the join becomes a pure equi-join on (key, bucket) with the band
    * predicate as a post-filter. Each qualifying pair appears exactly once
    * (a right row has one bucket). Cost: 2× the left rows through one
    * equi-join shuffle — no broadcast-nested-loop, no cross product; at
    * 100 TB the shuffle key (key, bucket) also bounds per-reducer work by
    * time locality instead of one reducer per hot key. */
  def bandJoin(
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      widthSeconds: Long,
      leftPrefix: String = "l_",
      rightPrefix: String = "r_")(left: DataFrame): DataFrame = {
    // floor(epochSeconds / width); floor-of-double is exact here (epoch
    // seconds ≪ 2^53). Column./ is double division, hence the floor.
    def bucket(c: org.apache.spark.sql.Column) =
      floor(unix_timestamp(c) / widthSeconds).cast("long")
    val lSel = left.columns.map(c => col(c).as(s"$leftPrefix$c"))
    val rSel = right.columns.map(c => col(c).as(s"$rightPrefix$c"))
    val l = left.select(lSel: _*)
      .withColumn("__k", col(s"$leftPrefix$key"))
      .withColumn("__bucket",
        explode(array(bucket(col(s"$leftPrefix$leftTime")),
          bucket(col(s"$leftPrefix$leftTime")) + 1)))
    val r = right.select(rSel: _*)
      .withColumn("__k", col(s"$rightPrefix$key"))
      .withColumn("__bucket", bucket(col(s"$rightPrefix$rightTime")))
    val delta = unix_micros(col(s"$rightPrefix$rightTime")) -
      unix_micros(col(s"$leftPrefix$leftTime"))
    l.join(r, Seq("__k", "__bucket"))
      .filter(delta >= 0 && delta <= widthSeconds * 1000000L)
      .drop("__k", "__bucket")
      .withColumn("delta_us", delta)
  }

  /** Interval OVERLAP join: pairs of (left, right) rows with the same
    * `key` whose half-open intervals `[start, end)` overlap —
    * `lStart < rEnd AND rStart < lEnd`. A zero-length interval behaves
    * as an INSTANT: it matches intervals strictly containing its point
    * (with `overlap_us` 0) and never matches another instant — the
    * standard overlaps-predicate semantics. The two-sided
    * generalization of [[bandJoin]] (point vs band):
    * session-vs-session, outage-vs-request, visit-vs-campaign.
    *
    * Never a nested-loop plan: both sides explode to the
    * `widthSeconds` buckets their interval covers and the join is a
    * pure equi-join on (key, bucket). Each overlapping pair would meet
    * in EVERY shared bucket, so a pair is emitted only in the bucket
    * containing the overlap's START (`floor(max(lStart, rStart)/w)`) —
    * the canonical one-bucket dedup, a post-filter, not a distinct.
    * Choose `widthSeconds` near the typical interval length: cost is
    * `span/width + 1` bucket rows per interval, and per-reducer work is
    * bounded by (key, time-locality) exactly like [[bandJoin]].
    * Rows with a NULL endpoint never match (no place on a timeline). */
  def intervalJoin(
      right: DataFrame,
      key: String,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      widthSeconds: Long,
      leftPrefix: String = "l_",
      rightPrefix: String = "r_")(left: DataFrame): DataFrame = {
    require(widthSeconds > 0, "bucket width must be positive")
    val w = widthSeconds * 1000000L
    def us(c: org.apache.spark.sql.Column) = unix_micros(c)
    // floor(us/w) without a SQL-string detour: (c − pmod) is an exact
    // multiple of w and µs epochs sit far below 2^53, so the double
    // division is exact
    def bucket(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(w))) / lit(w)).cast("long")
    def side(df: DataFrame, prefix: String, s: String, e: String) =
      // inverted intervals (end before start) are data errors that
      // would otherwise build a DESCENDING bucket sequence and emit
      // phantom pairs — dropped like NULL endpoints
      df.filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
        .select(df.columns.map(c => col(c).as(s"$prefix$c")): _*)
        .withColumn("__k", col(s"$prefix$key"))
        .withColumn("__us_s", us(col(s"$prefix$s")))
        .withColumn("__us_e", us(col(s"$prefix$e")))
        .withColumn("__bucket",
          explode(sequence(bucket(col("__us_s")), bucket(col("__us_e")))))
    val l = side(left, leftPrefix, leftStart, leftEnd)
      .withColumnRenamed("__us_s", "__ls").withColumnRenamed("__us_e", "__le")
    val r = side(right, rightPrefix, rightStart, rightEnd)
      .withColumnRenamed("__us_s", "__rs").withColumnRenamed("__us_e", "__re")
    val overlapStart = greatest(col("__ls"), col("__rs"))
    l.join(r, Seq("__k", "__bucket"))
      .filter(col("__ls") < col("__re") && col("__rs") < col("__le"))
      // one-bucket dedup: only the bucket holding the overlap start emits
      .filter(col("__bucket") === bucket(overlapStart))
      .withColumn("overlap_us",
        least(col("__le"), col("__re")) - overlapStart)
      .drop("__k", "__bucket", "__ls", "__le", "__rs", "__re")
  }

  /** Fixed-interval resample with gap fill: per `key`, bucket events
    * into `stepSeconds` intervals and emit ONE row per bucket of the
    * key's [first, last] active range — including the empty buckets
    * between events — carrying the bucket's event count (`n_events`,
    * 0 on gaps), the value of the bucket's LATEST event (`v_last`,
    * NULL on gaps; latest by (`ts`, `tieBreak`) so ties are
    * deterministic), and that value forward-filled across gaps
    * (`v_ffill` — the time-series regularization every
    * sessionless-metric / training-curve pipeline needs before
    * windowed math, where a missing interval must mean "unchanged",
    * not "absent").
    *
    * Values pass through UNAGGREGATED (last-event semantics, not a
    * sum), so doubles survive bit-identically into the oracle; counts
    * are the only arithmetic. Bucket index is floor(epochMicros/step)
    * via the exact integer `(us − pmod(us, step)) div step` (no
    * floating-point detour, negative epochs floor correctly — the
    * loader's own idiom).
    *
    * Scale shape: one hash-agg shuffle of the events on (key, bucket);
    * the per-key spine derives from the AGGREGATED frame (|keys ×
    * active buckets| rows — localCheckpointed once for its two
    * consumers, never a re-scan of the events), exploded with
    * `sequence(lo, hi)` DISTRIBUTED per key — no driver-side range
    * loop; then one left join on (key, bucket) and one per-key window
    * for the forward fill. Skew: a key's cost is its active time range
    * over `stepSeconds` — choose the step so range/step stays
    * task-sized (a year at 1 s is 31M rows per key; at 1 h it's 8.7 k).
    * Rows with a NULL timestamp are dropped (no place on a timeline —
    * the [[asOfJoin]] doctrine). */
  def resample(
      key: String, ts: String, valueField: String, stepSeconds: Long,
      tieBreak: String)(df: DataFrame): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val stepUs = stepSeconds * 1000000L
    val src = df.filter(col(ts).isNotNull)
      .select(col(key).as("__k"), col(ts).as("__ts"),
        col(valueField).as("__v"), col(tieBreak).as("__tb"))
      .withColumn("__us", unix_micros(col("__ts")))
      .withColumn("__bi", expr(s"(__us - pmod(__us, ${stepUs}L)) div ${stepUs}L"))
    val perBucket = src.groupBy("__k", "__bi")
      .agg(count(lit(1)).as("n_events"),
        max_by(col("__v"), struct(col("__us"), col("__tb"))).as("v_last"))
      .localCheckpoint()
    val spine = perBucket.groupBy("__k")
      .agg(min("__bi").as("__lo"), max("__bi").as("__hi"))
      .select(col("__k"), explode(sequence(col("__lo"), col("__hi"))).as("__bi"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__bi"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perBucket, Seq("__k", "__bi"), "left")
      .select(col("__k").as(key),
        timestamp_micros(col("__bi") * stepUs).as("bucket_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("v_last"),
        last(col("v_last"), ignoreNulls = true).over(w).as("v_ffill"))
  }

  /** Time-decayed counts — recency-weighted activity per key
    * ("which event types are hot NOW?"), with the decay arithmetic kept
    * EXACT instead of transcendental: age quantizes to half-life
    * buckets `k = clamp(⌊(now − ts)/halfLife⌋, 0, kMax)` and each row
    * contributes weight 2^−k — a dyadic rational, so rows sum as the
    * SCALED INTEGERS `2^(kMax−k)` (decimal(38,0) / HUGEINT, exact at
    * any corpus size and any addition order) and ONE final division by
    * 2^kMax (an exact double) produces `decayed = Σ 2^−k`. A float
    * `exp(−λ·age)` would neither hash-match cross-engine (libm) nor
    * sum order-independently; the bucketed form is the
    * no-transcendentals doctrine applied to decay. `now` is a CALLER
    * parameter — a deterministic pipeline has no ambient clock (and
    * neither does the oracle). Future timestamps clamp to k = 0
    * (weight 1); ages past kMax half-lives flatten at 2^−kMax; NULL ts
    * drops. Seconds granularity (the sessionize floor-epoch
    * convention). One hash-agg. */
  def decayedCounts(
      keys: Seq[String], tsField: String, now: java.sql.Timestamp,
      halfLifeSeconds: Long, kMax: Int = 40)(df: DataFrame): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(halfLifeSeconds >= 1, "halfLifeSeconds must be >= 1")
    require(kMax >= 1 && kMax <= 62, s"kMax must be in [1, 62]: $kMax")
    val nowSec = now.getTime / 1000L
    val k = least(greatest(
      floor((lit(nowSec) - unix_timestamp(col(tsField))).cast("double") /
        halfLifeSeconds).cast("long"), lit(0L)), lit(kMax.toLong))
    df.filter(col(tsField).isNotNull)
      .withColumn("__w", call_function("shiftleft", lit(1L),
        (lit(kMax.toLong) - k).cast("int")).cast("decimal(38,0)"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (sum(col("__w")).cast("double") / lit(math.pow(2.0, kMax)))
          .as("decayed"))
  }

  /** OHLC time buckets — the candlestick aggregation over a value
    * series: per key and tumbling bucket, the OPENING value (at the
    * earliest (ts, tieBreak)), the high, the low, the CLOSING value
    * (latest), and the event count. Open/close ride `min_by`/`max_by`
    * on the composite (ts, tieBreak…) struct — deterministic under ts
    * ties when `tieBreak` makes the tuple unique (pass the event id),
    * where a bare first()/last() over an unordered group would not be.
    * One hash-agg, no window, no sort; NULL ts or value rows drop (no
    * bucket / no price). The DuckDB oracle expresses the same picks as
    * ordered-aggregate `first/last(v ORDER BY ts, tie)`. */
  def ohlcBuckets(
      tsField: String, valueField: String, bucketLength: String,
      keys: Seq[String] = Nil, tieBreak: Seq[String] = Nil)(
      df: DataFrame): DataFrame = {
    val orderKey = struct((tsField +: tieBreak).map(col): _*)
    df.filter(col(tsField).isNotNull && col(valueField).isNotNull)
      .groupBy(keys.map(col) :+
        window(col(tsField), bucketLength).as("__w"): _*)
      .agg(
        min_by(col(valueField), orderKey).as("open"),
        max(col(valueField)).as("high"),
        min(col(valueField)).as("low"),
        max_by(col(valueField), orderKey).as("close"),
        count(lit(1)).as("n"))
      .select(keys.map(col) :+ col("__w.start").as("bucket_start") :+
        col("open") :+ col("high") :+ col("low") :+ col("close") :+
        col("n"): _*)
  }

}
