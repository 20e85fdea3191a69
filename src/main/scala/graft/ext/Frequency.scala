package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequency-threshold heavy hitters in the two-pass shape that
  * scales to a 100 TB key stream (extension surface, SURVEY.md §2.12;
  * the reference's `count_duplicates` + Python `HAVING`-style filters
  * collapse into one distributed op here).
  *
  * The naive plan — `GROUP BY key HAVING count(*) > θ·N` — shuffles
  * EVERY distinct key: at corpus scale the token vocabulary is billions
  * of keys, almost all of which lose the HAVING filter after paying the
  * full shuffle. The classical fix is two passes:
  *
  *  1. '''Candidate pass''' — each partition runs a Misra–Gries summary
  *     with `cap − 1` counters over its local stream. MG guarantees any
  *     key with local count > n_p/cap survives partition p; by
  *     averaging, a key with GLOBAL count > N/cap must exceed that bound
  *     in at least one partition, so the union of per-partition
  *     survivors is a guaranteed superset of every global heavy hitter
  *     at support 1/cap. The summary is ≤ cap−1 keys per partition —
  *     kilobytes per task regardless of input size — and ships as ONE
  *     row per partition (survivor array + partition row count), so the
  *     only shuffle in pass 1 moves `partitions × cap` keys, not the
  *     vocabulary.
  *  2. '''Exact pass''' — the candidate set broadcasts back; a
  *     broadcast semi-join keeps only candidate occurrences, and the
  *     exact `GROUP BY` now aggregates a vanishing fraction of the
  *     stream. The threshold `count > minFreq·N` (N summed from the
  *     pass-1 partition counts — no third scan) then filters with
  *     EXACT counts, so the output is precisely the naive plan's
  *     output whenever `minFreq ≥ 1/cap` — which the constructor
  *     enforces by deriving `cap = ⌈1/minFreq⌉`.
  *
  * Cost: two scans of the stream, one kilobyte-scale shuffle, one
  * broadcast, one tiny aggregation. No driver-side collect anywhere —
  * the candidate set and the total stay DataFrames (broadcast by the
  * planner). Determinism: MG survivor sets depend on partitioning, but
  * the FINAL output does not — any superset of the true heavy hitters
  * yields the same exact-pass result, so reruns and the DuckDB oracle
  * (the naive plan) agree bit-for-bit. The threshold comparison is one
  * IEEE multiply + compare, identical in both engines.
  */
object Frequency {

  /** Keys occurring in strictly more than `minFreq` of the rows of
    * `df`'s `keyField` column (NULL keys are dropped — a NULL key is
    * "no key", the library-wide doctrine), with their exact counts:
    * `(keyField, cnt)`. See the object doc for the two-pass plan. */
  def heavyHitters(keyField: String, minFreq: Double)(
      df: DataFrame): DataFrame = {
    require(minFreq > 0.0 && minFreq < 1.0,
      s"heavyHitters: minFreq must be in (0, 1), got $minFreq")
    val cap = math.max(2, math.ceil(1.0 / minFreq).toInt)
    val spark = df.sparkSession
    import spark.implicits._
    val stream = df.select(col(keyField).cast("string").as(keyField))
      .filter(col(keyField).isNotNull)
    // pass 1: one (survivors, rowCount) row per partition. The summary
    // is tiny, but it derives from a full scan — localCheckpoint so its
    // two consumers (total + candidates) don't scan the stream twice.
    val summaries = stream.as[String].mapPartitions { it =>
      // initial capacity clamped: a tiny minFreq makes cap huge and
      // cap*2 would overflow Int / pre-allocate gigabytes — the map
      // grows to at most cap-1 entries on its own
      val counters =
        new java.util.HashMap[String, Long](math.min(cap * 2L, 1L << 16).toInt)
      var n = 0L
      while (it.hasNext) {
        val k = it.next()
        n += 1
        val c = counters.get(k)
        if (c != 0L) counters.put(k, c + 1L)
        else if (counters.size < cap - 1) counters.put(k, 1L)
        else {
          // decrement-all: each round retires `cap` stream positions
          // (the new key + cap−1 counters), so total decrement work is
          // O(stream/cap · cap) = O(stream) — amortized O(1) per row
          val del = new java.util.ArrayList[String]
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) del.add(kv.getKey)
            else kv.setValue(kv.getValue - 1L)
          }
          del.forEach(k2 => counters.remove(k2))
        }
      }
      Iterator.single(
        (counters.keySet.toArray(Array.empty[String]).toSeq, n))
    }.toDF("survivors", "np").localCheckpoint()
    val total = summaries.agg(sum($"np").cast("long").as("__total"))
    val cands = summaries
      .select(explode($"survivors").as(keyField)).distinct()
    // pass 2: candidate semi-join (broadcast — ≤ partitions·cap keys by
    // construction) shrinks the stream BEFORE the exact aggregation
    stream.join(broadcast(cands), Seq(keyField), "left_semi")
      .groupBy(keyField).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter($"cnt".cast("double") > lit(minFreq) * $"__total".cast("double"))
      .drop("__total")
  }

  /** Corpus frequent terms: whitespace tokens of `textField` (NULL text
    * tokenizes as empty text — the one-token [""] stream, matching the
    * library's split semantics) pushed through [[heavyHitters]].
    * Output: `(token, cnt)` for every token above `minFreq` of the
    * corpus token volume. */
  def heavyHitterTerms(textField: String, minFreq: Double)(
      df: DataFrame): DataFrame =
    heavyHitters("token", minFreq)(
      df.select(
        explode(TextOps.tokens(coalesce(col(textField), lit(""))))
          .as("token")))

  /** Per-GROUP heavy hitters: keys above `minFreq` of THEIR GROUP's
    * stream ("terms above 1% of each domain's volume" — the per-source
    * boilerplate profile, where a key can be heavy in one small source
    * and invisible corpus-wide). Same two passes, with the Misra–Gries
    * summaries keyed per group inside each partition: the averaging
    * argument applies within each group's sub-stream, so the per-group
    * candidate supersets stay guaranteed; per-group totals ride the
    * pass-1 rows exactly like the global form.
    *
    * Memory contract: a partition holds `groups-present × cap`
    * counters — groups must be FEW (sources, languages, shards), not
    * high-cardinality keys like users; for that shape use a plain
    * per-(group,key) aggregation, which is already group-bounded.
    * Output: `(groupField, keyField, cnt)`, exact. NULL groups or keys
    * drop (the library doctrine). */
  def heavyHittersByGroup(
      groupField: String, keyField: String, minFreq: Double)(
      df: DataFrame): DataFrame = {
    require(minFreq > 0.0 && minFreq < 1.0,
      s"heavyHittersByGroup: minFreq must be in (0, 1), got $minFreq")
    val cap = math.max(2, math.ceil(1.0 / minFreq).toInt)
    val spark = df.sparkSession
    import spark.implicits._
    val stream = df.select(col(groupField).cast("string").as(groupField),
        col(keyField).cast("string").as(keyField))
      .filter(col(groupField).isNotNull && col(keyField).isNotNull)
    val summaries = stream.as[(String, String)].mapPartitions { it =>
      val perGroup = new java.util.HashMap[
        String, (java.util.HashMap[String, Long], Array[Long])]
      while (it.hasNext) {
        val (g, k) = it.next()
        var st = perGroup.get(g)
        if (st == null) {
          st = (new java.util.HashMap[String, Long](
            math.min(cap * 2L, 1L << 12).toInt), Array(0L))
          perGroup.put(g, st)
        }
        val (counters, n) = st
        n(0) += 1L
        val c = counters.get(k)
        if (c != 0L) counters.put(k, c + 1L)
        else if (counters.size < cap - 1) counters.put(k, 1L)
        else {
          val del = new java.util.ArrayList[String]
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) del.add(kv.getKey)
            else kv.setValue(kv.getValue - 1L)
          }
          del.forEach(k2 => counters.remove(k2))
        }
      }
      import scala.jdk.CollectionConverters._
      perGroup.entrySet().iterator().asScala.map { ent =>
        (ent.getKey,
          ent.getValue._1.keySet.toArray(Array.empty[String]).toSeq,
          ent.getValue._2(0))
      }
    }.toDF(groupField, "survivors", "np").localCheckpoint()
    val totals = summaries.groupBy(groupField)
      .agg(sum($"np").cast("long").as("__total"))
    val cands = summaries
      .select(col(groupField), explode($"survivors").as(keyField)).distinct()
    stream.join(broadcast(cands), Seq(groupField, keyField), "left_semi")
      .groupBy(groupField, keyField).agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), Seq(groupField))
      .filter($"cnt".cast("double") > lit(minFreq) * $"__total".cast("double"))
      .drop("__total")
  }

  /** Frequent phrases: the same two-pass machinery over the word
    * n-gram stream (native [[TextOps.shingles]] kernel — DISTINCT
    * grams per document, so the count is DOCUMENT frequency and a
    * document repeating a phrase a thousand times votes once — the
    * boilerplate-detection semantics, matching every other gram
    * consumer in this library). The scale argument is stronger than
    * the unigram case: the n-gram vocabulary is combinatorially larger
    * than the token vocabulary, which is exactly what the naive
    * GROUP BY shuffles and the candidate pass does not. Output:
    * `(phrase, cnt)` above `minFreq` of the corpus gram volume. */
  def heavyHitterPhrases(textField: String, n: Int, minFreq: Double)(
      df: DataFrame): DataFrame =
    heavyHitters("phrase", minFreq)(
      df.select(
        explode(TextOps.shingles(coalesce(col(textField), lit("")), n))
          .as("phrase")))

  /** Association rules over (transaction, item) rows — classic
    * market-basket mining put to corpus-curation work: which tags
    * co-occur on documents, which domains co-appear in a user's
    * session, which licenses ride together — `support`, `confidence`,
    * and `lift` for every directed rule `antecedent → consequent`
    * whose PAIR count clears `minSupportCount` and whose confidence
    * clears `minConfidence`.
    *
    * Semantics: a "basket" is the DISTINCT item set of one
    * transaction (duplicates collapse — presence, not multiplicity;
    * items compare as strings, the [[graft.probes.Probes.chiSquareSelect]]
    * convention); `support = n_ab/N` over N = all baskets,
    * `confidence = n_ab/n_a`, `lift = (n_ab·N)/(n_a·n_b)` — every
    * count exact, every ratio one fixed division (lift multiplies as
    * doubles so no long overflow at corpus scale). Baskets larger
    * than `maxBasket` are excluded from PAIR GENERATION only (a
    * degenerate mega-basket is quadratic in its size — the LSH bucket
    * cap doctrine); their items still count toward n_i and N, so
    * support/confidence denominators stay honest.
    *
    * Scale shape: one distinct-pass, one per-basket collect capped at
    * `maxBasket` with bucket-local pair explosion (never an uncapped
    * self-join), two small marginal joins, a one-row N broadcast.
    * Output: `antecedent, consequent, pair_count, antecedent_count,
    * support, confidence, lift`. */
  def associationRules(
      txnField: String, itemField: String,
      minSupportCount: Long = 2, minConfidence: Double = 0.0,
      maxBasket: Int = 256)(df: DataFrame): DataFrame = {
    require(minSupportCount >= 1,
      s"minSupportCount must be >= 1, got $minSupportCount")
    require(minConfidence >= 0.0 && minConfidence <= 1.0,
      s"minConfidence must be in [0, 1], got $minConfidence")
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val b = df
      .filter(col(txnField).isNotNull && col(itemField).isNotNull)
      .select(col(txnField).as("__t"),
        col(itemField).cast("string").as("__i"))
      .distinct()
      .localCheckpoint() // feeds N, item counts, AND pair generation
    val n = b.agg(countDistinct(col("__t")).as("__n"))
    val items = b.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val pairs = b
      .groupBy(col("__t"))
      .agg(collect_list(col("__i")).as("__is"))
      .filter(size(col("__is")).between(2, maxBasket))
      .select(explode(flatten(transform(col("__is"), x =>
        transform(filter(col("__is"), y => x < y), y =>
          struct(x.as("ia"), y.as("ib")))))).as("__p"))
      .groupBy(col("__p.ia").as("__ia"), col("__p.ib").as("__ib"))
      .agg(count(lit(1)).as("__nab"))
      .filter(col("__nab") >= minSupportCount)
    val directed = pairs
      .select(col("__ia").as("antecedent"), col("__ib").as("consequent"),
        col("__nab"))
      .unionByName(pairs.select(col("__ib").as("antecedent"),
        col("__ia").as("consequent"), col("__nab")))
    directed
      .join(items.select(col("__i").as("antecedent"),
        col("__ni").as("antecedent_count")), "antecedent")
      .join(items.select(col("__i").as("consequent"),
        col("__ni").as("__nc")), "consequent")
      .crossJoin(broadcast(n))
      .withColumn("support",
        col("__nab").cast("double") / col("__n").cast("double"))
      .withColumn("confidence",
        col("__nab").cast("double") / col("antecedent_count").cast("double"))
      .withColumn("lift",
        (col("__nab").cast("double") * col("__n").cast("double")) /
          (col("antecedent_count").cast("double") * col("__nc").cast("double")))
      .filter(col("confidence") >= minConfidence)
      .select(col("antecedent"), col("consequent"),
        col("__nab").as("pair_count"), col("antecedent_count"),
        col("support"), col("confidence"), col("lift"))
  }
}
