package graft

/** Automated plan hygiene over the ENTIRE query surface: every query in
  * [[SparkEntry.queries]] is planned against the smallest fixtures and
  * its physical plan is scanned for the anti-patterns that kill a job at
  * 100 TB. A regression that sneaks a cartesian product, an accidental
  * nested-loop join, or a Scala UDF into any query fails here — the
  * plan-shape guarantees the Scaladoc claims stop being prose and become
  * assertions.
  *
  * Allowed exceptions are explicit and minimal:
  *  - `BroadcastNestedLoopJoin` only where the build side is a one-row
  *    aggregate or a bounded query/centroid set (brute-force topk's
  *    broadcast query side, IVF's centroid ranking, tfidf/key_skew's
  *    corpus-count scalar) — those are cross joins by construction with
  *    a provably tiny side.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a broadcast nested-loop
    * join against a PROVABLY bounded side (one-row count or an
    * explicitly filtered query/centroid subset). */
  private val boundedBroadcastCross = Set(
    "similarity_topk",   // broadcast query set (vec_id < 10)
    "similarity_topk_q8", // same broadcast query set, int8 codes
    "knn_label",         // broadcast query set (vec_id < 50)
    "centroid_assign",   // broadcast ONE-row centroid array
    "similarity_hamming", // broadcast query sketch set (vec_id < 10)
    "similarity_hamming_wide", // broadcast query sketch set, 2-word sketches
    "similarity_matryoshka", // broadcast query prefix-slice set
    "similarity_mmr",    // broadcast query set (vec_id < 5) feeding the pool
    "hybrid_rrf",        // broadcast query sets feeding BOTH fused rankers
    "ranking_metrics",   // broadcast query sets feeding BOTH graded rungs
    "hard_negatives",    // broadcast query set (vec_id < 10), banded rank
    "late_interaction",  // broadcast multi-vector query set (vec_id < 5)
    "similarity_pq",     // broadcast one-row centroid array + query LUTs
    "mix_report",        // broadcast one-row corpus token total
    "downsample_mix",    // same one-row total inside its mixReport
    "temperature_mix",   // broadcast one-row Σ√n fold
    "pipeline_flagship", // same one-row Σ√n fold inside its mix stage
    "similarity_ivf",    // broadcast centroid ranking (id < nCentroids)
    "similarity_ivf_pq", // broadcast coarse cells + one-row codebook array + query LUTs
    "similarity_ivf_pq_res", // same legs, residual-encoded codes
    "tfidf_top_terms",   // broadcast one-row corpus count
    "tfidf_cosine_pairs", // broadcast one-row corpus count into weights
    "dsir_affinity",     // broadcast one-row (raw total, target total) aggregate
    "bigram_lm_quality", // broadcast one-row corpus token total
    "trigram_lm_quality", // broadcast one-row count-table unigram total
    "trigram_lm_transfer", // same one-row total, src0-trained model
    "ccnet_buckets",     // the trigram LM leg's one-row unigram total inside the composition
    "event_funnel",      // broadcast one-row entered-users count
    "key_skew",          // broadcast one-row total count
    "bm25_topk",         // broadcast one-row (N, avgdl, df…) stats aggregate
    "bm25_batch",        // broadcast one-row (N, Σdl) stats aggregate
    "bm25_serve",        // same one-row stats broadcast, stored-index form
    "bm25_prf",          // same stats broadcast inside its feedback pass
    "heavy_hitter_terms",  // broadcast one-row stream total (pass-1 Σn_p)
    "oov_rate",            // its vocab leg IS heavy_hitter_terms — same one-row total
    "heavy_hitter_phrases", // same two-pass machinery over the gram stream
    "theta_overlap",     // broadcast |groups|-row sketch-state pair join
    "page_rank",         // broadcast one-row node-count aggregate
    "page_rank_weighted", // same one-row broadcast, weighted edges
    "balance_classes",   // broadcast one-row min-class-size aggregate
    "category_drift",    // broadcast one-row (total_before, total_after)
    "numeric_drift",     // broadcast one-row (total_before, total_after)
    "token_shift",       // broadcast one-row corpus token grand total
    "dedup_eval",        // broadcast one-row exact-truth pair count
    "label_agreement",   // broadcast one-row pe-numerator aggregate
    "score_calibration", // broadcast one-row ECE aggregate
    "label_qa",          // composes both of the above — same one-row builds
    "fleiss_kappa",      // broadcast one-row totals (N, P̄) into the κ dag
    "krippendorff_alpha", // broadcast one-row (N, A) + one-row Σn_c² aggregates
    "krippendorff_ordinal", // broadcast |V|²-bounded (maxLabels-guarded) pair frame + one-row D_o/D_e folds
    "graph_modularity",  // broadcast one-row m + one-row Q folds
    "quantile_normalize", // broadcast one-row pooled-N aggregate
    "association_rules", // broadcast one-row basket-total N
    "fellegi_sunter_fit", // broadcast 1-row EM parameter frame per round
    "collocations",      // broadcast one-row unigram + bigram totals
    "ann_recall_eval",   // broadcast query set + one-row truth count
    "histogram_2d",      // broadcast one-row cell-count total
    "budget_allocation", // broadcast one-row weight total + spent base
    "target_encode",     // broadcast one-row global-mean aggregate
    "target_encode_serve", // same one-row global broadcast, serve side
    "t_closeness",       // broadcast one-row global sensitive-total
    "bradley_terry",     // broadcast one-row L1 normalizer per MM round
    "k_core",            // broadcast one-row converged-flag aggregate
    "k_truss",           // broadcast one-row converged-flag aggregate
    "retention_curve",   // broadcast one-row corpus-max-ts aggregate (the censoring horizon)
    "logrank_test",      // same one-row corpus-max-ts broadcast on the same subject frame
    "logrank_gehan",     // same one-row corpus-max-ts broadcast on the same subject frame
    "logrank_k",         // same one-row corpus-max-ts broadcast on the same subject frame
    "logrank_stratified", // same one-row corpus-max-ts broadcast on the same subject frame
    "logrank_bh",        // the logrank_k arm z's through chebyshevP->bhCorrect — same build
    "rmst_retention",    // same one-row corpus-max-ts broadcast on the same subject frame
    "survival_median",   // same one-row corpus-max-ts broadcast on the same subject frame
    "corpus_divergence") // broadcast bounded top-V+1 term frame + one-row totals

  test("no query plans a cartesian product or an unbounded nested-loop join") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
      if (!boundedBroadcastCross(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join:\n$plan")
    }
  }

  test("top-k queries select via TakeOrderedAndProject, not a global sort") {
    // The Scaladocs claim these queries' top-k selection is per-partition
    // heaps merged on the driver (TakeOrderedAndProject) — at 100 TB a
    // global Sort feeding a Limit is a full shuffle of the corpus. A
    // trailing orderBy over the ≤ k survivors (oracle determinism) may
    // still plan a Sort; the pin is that the SELECTION node is present.
    Seq("bm25_topk", "sample_n_exact", "top_ngrams").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name does not plan TakeOrderedAndProject:\n$plan")
    }
  }

  test("per-group top-k queries plan WindowGroupLimit partial pushdown") {
    // rank-filter windows must prune losers BEFORE the window shuffle
    // (per-partition heaps) — at 100 TB ranking every candidate through
    // a full window sort, then filtering, shuffles the whole candidate
    // set for nothing.
    Seq("bm25_batch", "topk_per_group", "tfidf_top_terms").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$name does not plan WindowGroupLimit:\n$plan")
    }
  }

  test("source_overlap and unigram_cf_quality scan the corpus exactly once") {
    // Both ops feed one expensive exploded projection to TWO consumers;
    // without materialization Catalyst recomputes the dominant
    // scan → explode stage once per consumer (the r8 verdict's heaviest
    // bench finding). The ops localCheckpoint the shared frame, so the
    // executed plan must contain ZERO parquet scans of the corpus —
    // the single scan happened once, at checkpoint materialization —
    // and every consumer branch must read the checkpointed RDD.
    // containment_pairs joins the checkpointed gram frame's totals and
    // buckets — same two-consumer shape, same zero-re-scan requirement
    Seq("source_overlap", "source_overlap_sampled",
        "unigram_cf_quality", "mix_report",
        "containment_pairs", "containment_pairs_sampled").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("FileScan") && !plan.contains("documents"),
        s"$name re-scans the corpus instead of its checkpoint:\n$plan")
      assert(plan.contains("ExistingRDD"),
        s"$name shows no checkpointed-RDD scan:\n$plan")
    }
    // downsample_mix joins the corpus against its checkpointed report:
    // exactly ONE corpus scan (the join leg), the report side none
    val dsPlan = SparkEntry.queries("downsample_mix")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(dsPlan.linesIterator.count(_.contains("FileScan")) === 1,
      s"downsample_mix should scan the corpus exactly once:\n$dsPlan")
  }

  test("similarity_ivf_pq generates ADC candidates via a cell equi-join, not a code crossJoin") {
    // The IVF-ADC claim: the stored code table is joined to the probed
    // (query, cell) pairs on `cell` — a hash equi-join — so only probed
    // cells' members are ever ADC-scored. If the composition regressed
    // to pqTopK's all-codes crossJoin, the cell key would vanish from
    // every hash join and the full-code-scan claim would be prose.
    Seq("similarity_ivf_pq", "similarity_ivf_pq_res").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin [cell"),
        s"$name does not hash-join the code table on cell:\n$plan")
    }
  }

  test("no query plans a Scala UDF except the documented predicate surface") {
    SparkEntry.queries.foreach { case (name, fn) =>
      // filter_by_predicate IS the reference's UDF surface; its query
      // exists exactly to pin those semantics
      if (name != "filter_by_predicate") {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        assert(!plan.contains("UDF("), s"$name plans a Scala UDF:\n$plan")
      }
    }
  }

  test("§2.3 filter queries push their predicates into the parquet scan") {
    // filter_by_predicate is excluded by construction: a Scala UDF is
    // opaque to the source API, which is exactly why it is the
    // last-resort surface. Every declarative filter op must reach the
    // scan as a pushed source filter — a scan with PushedFilters: []
    // reads and materializes every row group before filtering.
    // filter_empty is absent: its query filters a regexp_replace-derived
    // column, and a predicate over a computed expression has no source
    // column to push to — the op itself pushes when given a raw column
    // (filter_not_empty, same code path, is asserted below).
    val declarativeFilters = Seq("filter_by_value", "filter_by_value_discard",
      "filter_by_set", "filter_by_range", "filter_not_empty")
    declarativeFilters.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        .filter(_.contains("PushedFilters"))
      assert(scans.nonEmpty, s"$name has no file scan with pushdown support")
      scans.foreach { s =>
        val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
          .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
        assert(pushed.trim.nonEmpty,
          s"$name scan has empty PushedFilters:\n$s")
      }
    }
  }

  test("parquet scans prune columns: no query reads every fixture column blindly") {
    // The widest fixture is lineitem (16 columns). Any query that touches
    // lineitem must scan a strict subset unless it explicitly selects all.
    val wideReaders = SparkEntry.queries.keys.filterNot(Set(
      "derive_disc_price", "filter_by_predicate", "join_details_large"))
    SparkEntry.queries.foreach { case (name, fn) =>
      if (wideReaders.exists(_ == name)) {
        val df = fn(spark, dir)
        val scans = df.queryExecution.executedPlan.collectLeaves()
          .map(_.toString).filter(_.contains("lineitem"))
        scans.foreach { s =>
          val readSchema = "ReadSchema: struct<([^>]*)>".r
            .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
          val nCols = if (readSchema.isEmpty) 0 else readSchema.split(",").length
          assert(nCols < 16, s"$name reads all 16 lineitem columns:\n$s")
        }
      }
    }
  }
}
