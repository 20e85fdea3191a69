package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the link-structure half of crawl
  * curation, next to the connectivity machinery in [[Dedup]]
  * (`connectedComponents` powers cluster dedup; these ops power
  * QUALITY PRIORS: a host linked by many reputable hosts is crawl-worthy,
  * an orphan island of self-links is not).
  *
  * Everything here is DataFrame-shaped: an edge list `(src, dst)` is
  * just a table, one iteration is join + aggregate, and Catalyst/AQE
  * handle skew (a hub host's in-links are one hot reduce key — AQE
  * skew-split or pre-salting apply as with any aggregation).
  */
object GraphOps {

  /** Fixed-iteration PageRank — the crawl-frontier/host-quality prior
    * (the shape behind Common Crawl's harmonic-centrality rankings):
    * `rank ← (1−d)/n + d · Σ_{u→v} rank(u)/outdeg(u)` for a fixed
    * `iterations` count from a uniform start. Deliberately the SIMPLE
    * formulation: dangling-node mass leaks (no redistribution) and
    * iteration count is fixed rather than convergence-tested — both
    * documented, both what the oracle replays.
    *
    * Self-loops and NULL endpoints are dropped and edges are
    * DISTINCTed (a link either exists or not; crawl multi-edges would
    * otherwise double-vote).
    *
    * Cross-engine exactness (why this hash-matches): the one
    * order-sensitive float reduction — summing in-neighbor
    * contributions — is pinned by collect → array_sort by src →
    * seeded left fold (the [[TextOps.bigramLmQuality]] discipline),
    * and every scalar step (`1/n`, `rank/outdeg`,
    * `base + d·sum`) is the same IEEE op sequence the oracle's SQL
    * spells out. n rides a ONE-ROW broadcast, never a driver action.
    *
    * Scale shape: per iteration, one equi-join of the edge list with
    * the |nodes| rank frame and one hash-agg keyed by dst — `k`
    * iterations = `k` bounded shuffles. The edge/node/outdeg frames
    * localCheckpoint ONCE (they feed every iteration), and each
    * iteration's rank frame checkpoints so plan depth stays constant.
    * Per-dst collected lists are bounded by in-degree — the per-key
    * memory bound every such op carries ([[graft.ops.WindowOps
    * .ewmaSmooth]]); hub-dominated graphs want the salted-agg
    * pattern first.
    *
    * Output: `node, rank`. */
  def pageRank(
      srcField: String, dstField: String,
      iterations: Int = 3, damping: Double = 0.85,
      weightField: String = "")(
      edges: DataFrame): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20], got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val weighted = weightField.nonEmpty
    // WEIGHTED form: each edge votes in proportion to its weight
    // (link counts between hosts, anchor quality): contribution =
    // rank(u) · w(u→v) / Σ w(u→*). Weights must be positive —
    // zero/negative/NULL-weight edges drop with the NULL endpoints
    // (a non-edge, same doctrine); duplicate (src, dst) rows in the
    // weighted form SUM their weights (multi-edges aggregate instead
    // of double-voting). Integral weights keep Σw exact; the
    // contribution stays one rank·w/Σw chain, so determinism is
    // unchanged.
    val base = edges
      .select(col(srcField).as("__s"), col(dstField).as("__d"),
        (if (weighted) col(weightField).cast("double")
        else lit(1.0)).as("__w"))
      .filter(col("__s").isNotNull && col("__d").isNotNull &&
        col("__s") =!= col("__d") && col("__w") > 0.0)
    val e = (if (weighted)
        base.groupBy(col("__s"), col("__d"))
          .agg(sum(col("__w")).as("__w"))
      else base.select(col("__s"), col("__d")).distinct()
        .withColumn("__w", lit(1.0)))
      .localCheckpoint()
    val nodes = e.select(col("__s").as("__v"))
      .unionByName(e.select(col("__d").as("__v")))
      .distinct()
      .localCheckpoint()
    val outdeg = e.groupBy(col("__s"))
      .agg(sum(col("__w")).as("__od"))
      .localCheckpoint()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("__v"), (lit(1.0) / col("__n")).as("__r"))
      .localCheckpoint()
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(outdeg, "__s")
        .join(ranks.withColumnRenamed("__v", "__s"), "__s")
        .groupBy(col("__d"))
        .agg(aggregate(
          array_sort(collect_list(struct(col("__s"),
            (col("__r") * col("__w") / col("__od")).as("__c")))),
          lit(0.0), (acc, x) => acc + x.getField("__c")).as("__sum"))
      ranks = nodes
        .join(contribs, nodes("__v") === contribs("__d"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("__v"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__sum"), lit(0.0))).as("__r"))
        .localCheckpoint()
      i += 1
    }
    ranks.select(col("__v").as("node"), col("__r").as("rank"))
  }

  /** Degree profile of an edge list: per node, out-degree, in-degree,
    * and total — the first diagnostic over any link graph (hub/orphan
    * detection, join-skew forecasting for [[pageRank]]). Self-loops
    * and NULLs dropped, edges DISTINCTed, same doctrine as
    * [[pageRank]]. */
  def degreeStats(srcField: String, dstField: String)(
      edges: DataFrame): DataFrame = {
    val e = edges
      .select(col(srcField).as("__s"), col(dstField).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull &&
        col("__s") =!= col("__d"))
      .distinct()
    val out = e.groupBy(col("__s").as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("__d").as("node"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }
}
