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
    * `exactOrder = false` is the PRODUCTION mode at hub scale: the
    * in-neighbor contribution sum becomes a plain order-free `sum()`
    * (a pure map-side-combining hash aggregation — no per-dst list, so
    * a 10M-in-link hub costs a hot reduce key, not a task's heap).
    * Mathematically identical; float addition order is engine-chosen,
    * so results agree with the exact mode to rounding (spec-asserted ≤
    * 1e-12 relative on the fixtures) but are not oracle-hash-pinnable.
    * The exact default stays the contract mode.
    *
    * Output: `node, rank`. */
  def pageRank(
      srcField: String, dstField: String,
      iterations: Int = 3, damping: Double = 0.85,
      weightField: String = "",
      exactOrder: Boolean = true)(
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
        .agg(
          (if (exactOrder)
            aggregate(
              array_sort(collect_list(struct(col("__s"),
                (col("__r") * col("__w") / col("__od")).as("__c")))),
              lit(0.0), (acc, x) => acc + x.getField("__c"))
          else
            sum(col("__r") * col("__w") / col("__od"))).as("__sum"))
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

  /** Per-node triangle count and local clustering coefficient over the
    * UNDIRECTED view of an edge list — the community-structure probe
    * next to [[degreeStats]]: link farms and mutual-citation rings
    * show up as dense triangle neighborhoods (high coefficient), while
    * legitimate hub pages have famously sparse ones.
    *
    * Edge doctrine as everywhere in this file: NULL endpoints and
    * self-loops drop, direction is erased (`least`/`greatest`
    * canonicalization), parallel edges DISTINCT to one.
    *
    * Algorithm — DEGREE-ORDERED ORIENTATION, the standard
    * scale-bounded formulation (not the naive triple self-join):
    * orient each undirected edge from its lower-(degree, id) endpoint
    * to the higher, enumerate wedges by self-joining the oriented
    * list on the apex, and close each wedge against the canonical
    * edge set. Every triangle is found EXACTLY once (at its
    * lowest-order apex), and — the scale argument — a node's oriented
    * out-degree is O(√m) regardless of its raw degree, so the wedge
    * join's per-key fan-out is bounded even at a hub whose raw degree
    * is millions: the apex self-join on a 10⁹-edge graph generates
    * O(m^1.5) wedges worst-case instead of the naive Σdeg² which a
    * single celebrity node drives quadratic. Three bounded shuffles
    * (canonicalize+distinct, degree join, wedge join) + one semi-ish
    * closing equi-join.
    *
    * Cross-engine exactness: counts are integers; the one float —
    * `clustering = 2·triangles / (deg·(deg−1))` — is a single
    * division of two exact integer products, NULL when `deg < 2`
    * (no wedges to close). Output: `node, degree, triangles,
    * clustering` including triangle-free nodes (zero-filled). */
  def triangleStats(srcField: String, dstField: String)(
      edges: DataFrame): DataFrame = {
    val s = col(srcField); val d = col(dstField)
    val und = edges
      .filter(s.isNotNull && d.isNotNull && s =!= d)
      .select(least(s, d).as("u"), greatest(s, d).as("v"))
      .distinct()
      .localCheckpoint() // feeds degrees, orientation, and wedge closing
    val deg = und.select(col("u").as("node"))
      .unionByName(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("__du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("__dv")), "v")
    // total order by (degree, id): ties broken by the id itself, so
    // the orientation is a strict tournament and no wedge double-counts
    val uFirst = (col("__du") < col("__dv")) ||
      (col("__du") === col("__dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint()
    // wedges at apex a; id-order on (b1, b2) matches und's canonical
    // (min, max) key, so the closing join is a plain equi-join
    val e1 = oriented.select(col("a"), col("b").as("__b1"))
    val e2 = oriented.select(col("a"), col("b").as("__b2"))
    val wedges = e1.join(e2, Seq("a"))
      .filter(col("__b1") < col("__b2"))
    val tri = wedges.join(
      und.select(col("u").as("__b1"), col("v").as("__b2")),
      Seq("__b1", "__b2"))
    val perNode = tri
      .select(explode(array(col("a"), col("__b1"), col("__b2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") < 2, lit(null).cast("double"))
          .otherwise((lit(2L) * col("triangles")).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double")))
  }
}
