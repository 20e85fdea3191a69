package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Neighborhood-overlap link prediction over the UNDIRECTED view of
    * an edge list — the missing-edge miner behind "these two hosts
    * cite the same dozen sources but never each other" (crawl
    * frontier expansion, entity-resolution candidate generation, the
    * graph analog of [[Dedup]]'s blocking): for every non-adjacent
    * pair sharing ≥ `minCommon` neighbors, three standard scores —
    * `common_neighbors` (raw count), `jaccard` (count over
    * neighborhood union) and `resource_allocation` (Σ 1/deg(shared) —
    * the Zhou–Lü–Zhang index; chosen over Adamic–Adar because 1/deg
    * is an exact rational while 1/ln(deg) drags libm floats into the
    * contract).
    *
    * Candidate pairs are enumerated as WEDGES (two edges sharing an
    * apex) — only pairs at distance 2 can score, so the all-pairs
    * frame never exists. Edge doctrine as everywhere in this file:
    * NULL endpoints and self-loops drop, direction erased, parallel
    * edges DISTINCT to one. Existing edges are anti-joined away
    * (prediction means the edge is NOT there).
    *
    * Determinism: counts and degrees are exact integers; `jaccard` is
    * one division of exact integers; `resource_allocation` is an
    * apex-id-ordered pinned fold (per-pair lists bounded by the
    * common-neighbor count).
    *
    * Scale shape: the wedge join fans out Σ_a deg(a)² — the same hub
    * hazard [[triangleStats]] dodges by orientation, which link
    * prediction CANNOT use (a wedge through a hub is still a
    * candidate). `maxDegree > 0` is the production knob: apexes above
    * the cap contribute no wedges (a node linked by half the graph
    * carries no signal about any specific pair — the standard
    * super-hub prune in every LP system), bounding fan-out at
    * cap² per apex. The cap changes semantics (documented,
    * spec-pinned); the oracle runs uncapped. Output:
    * `node_a, node_b, common_neighbors, jaccard,
    * resource_allocation`. */
  def linkPrediction(
      srcField: String, dstField: String,
      minCommon: Int = 1, maxDegree: Int = 0)(
      edges: DataFrame): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    require(maxDegree >= 0, s"maxDegree must be >= 0 (0 = uncapped)")
    val s = col(srcField); val d = col(dstField)
    val und = edges
      .filter(s.isNotNull && d.isNotNull && s =!= d)
      .select(least(s, d).as("u"), greatest(s, d).as("v"))
      .distinct()
      .localCheckpoint() // feeds adjacency, degrees, and the anti-join
    val adj = und.select(col("u").as("a"), col("v").as("b"))
      .unionByName(und.select(col("v").as("a"), col("u").as("b")))
    val deg = adj.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val apexes = (if (maxDegree > 0)
        adj.join(deg.filter(col("deg") <= maxDegree)
          .select(col("node").as("a")), "a")
      else adj)
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
    // the wedge enumeration explodes each apex's neighbor list against
    // itself — the one quadratic-in-degree stage of the op. Its input
    // rides the checkpointed edge frame, which AQE coalesces to 1-2
    // partitions at bench scale, so the whole explosion (and the
    // per-pair partial aggregation above it) ran on ONE task (measured:
    // a 10 s single-task stage of the ~10 s sf0.1 cell). Hash-spreading
    // the probe side by apex costs one |adjacency|-row exchange and
    // parallelizes the explosion across the session's cores; at scale
    // the spread is bounded per-key by the maxDegree cap. Pair set and
    // scores are unchanged (collect_list feeds a sort_array pin).
    // explicit partition count: a keyless repartition(col) is a
    // REPARTITION_BY_COL shuffle that AQE happily coalesces back to one
    // partition at this input size — pinning the count to the session's
    // core count keeps the explosion spread (scale-adaptive: it tracks
    // the executor fleet, not a constant). The SHUFFLE_HASH hint makes
    // the strategy deterministic: left to cost estimates the planner
    // alternated between broadcasting the (tiny here) repartitioned
    // side — which collapsed the explosion back onto the checkpointed
    // frame's single partition — and the parallel plan (measured: the
    // same rep flip-flopping 2.6 s ↔ 8 s). A shuffled-hash join keys
    // BOTH sides by apex, so the wedge stage always runs wide; at scale
    // neither adjacency side is broadcastable anyway.
    val wedges = apexes.select(col("a"), col("b").as("__b1"), col("__da"))
      .repartition(edges.sparkSession.sparkContext.defaultParallelism,
        col("a"))
      .join(apexes.select(col("a"), col("b").as("__b2"))
        .hint("SHUFFLE_HASH"), Seq("a"))
      .filter(col("__b1") < col("__b2"))
    val scored = wedges
      .groupBy(col("__b1"), col("__b2"))
      .agg(count(lit(1)).as("common_neighbors"),
        aggregate(
          sort_array(collect_list(struct(col("a").as("__k"),
            (lit(1.0) / col("__da").cast("double")).as("__t")))),
          lit(0.0), (acc, x) => acc + x.getField("__t"))
          .as("resource_allocation"))
      .filter(col("common_neighbors") >= minCommon)
      .join(und.select(col("u").as("__b1"), col("v").as("__b2"),
        lit(true).as("__e")), Seq("__b1", "__b2"), "left")
      .filter(col("__e").isNull) // distance-2 only: the edge must be absent
    scored
      .join(deg.select(col("node").as("__b1"), col("deg").as("__d1")),
        "__b1")
      .join(deg.select(col("node").as("__b2"), col("deg").as("__d2")),
        "__b2")
      .select(col("__b1").as("node_a"), col("__b2").as("node_b"),
        col("common_neighbors"),
        (col("common_neighbors").cast("double") /
          (col("__d1") + col("__d2") - col("common_neighbors"))
            .cast("double")).as("jaccard"),
        col("resource_allocation"))
  }

  /** Fixed-iteration HITS (Kleinberg's hubs-and-authorities) — the
    * DIRECTED-role companion to [[pageRank]]: a link directory that
    * points at every good source is a HUB, the sources it points at
    * are AUTHORITIES, and PageRank's single score conflates the two
    * (a perfect directory with no in-links ranks nowhere). Crawl
    * seeding wants both lists.
    *
    * The standard mutual recursion from a uniform hub start:
    * `auth(v) = Σ_{u→v} hub(u)`, then L1-normalize; `hub(u) =
    * Σ_{u→v} auth(v)`, then L1-normalize — `iterations` rounds, auth
    * before hub within a round. L1 (not the textbook L2) keeps every
    * step a sum-and-divide of exact chains — no sqrt, same ranking.
    * Edge doctrine as [[pageRank]]: NULL endpoints and self-loops
    * drop, multi-edges DISTINCT to one. Nodes with no in-links hold
    * authority 0; no out-links, hub 0.
    *
    * Cross-engine exactness: the two order-sensitive float sums per
    * iteration — per-node neighbor folds and the global L1
    * normalizer — are pinned (neighbor folds by neighbor id, the
    * normalizer by node id over the raw frame), every division a
    * single raw/total. `exactOrder = false` swaps both for plain
    * order-free `sum()` (pure hash-agg, no per-key lists — the
    * production mode at hub scale, ≤1e-12-relative parity
    * spec-pinned, same doctrine as [[pageRank]]).
    *
    * Scale shape: per iteration, two equi-join + hash-agg rounds over
    * the edge list and one one-row normalizer broadcast — 2k bounded
    * shuffles total; edge/node frames localCheckpoint once, rank
    * frames per iteration (constant plan depth). Output:
    * `node, hub, authority`. */
  def hits(
      srcField: String, dstField: String,
      iterations: Int = 3, exactOrder: Boolean = true)(
      edges: DataFrame): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20], got $iterations")
    val s = col(srcField); val d = col(dstField)
    val e = edges
      .filter(s.isNotNull && d.isNotNull && s =!= d)
      .select(s.as("__s"), d.as("__d"))
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("__s").as("__v"))
      .unionByName(e.select(col("__d").as("__v")))
      .distinct()
      .localCheckpoint()
    def pinnedSum(key: Column, term: Column) =
      if (exactOrder)
        aggregate(
          sort_array(collect_list(struct(key.as("__k"), term.as("__t")))),
          lit(0.0), (acc, x) => acc + x.getField("__t"))
      else sum(term)
    var hub = nodes.select(col("__v"), lit(1.0).as("__h"))
      .localCheckpoint()
    var auth: DataFrame = null
    var i = 0
    while (i < iterations) {
      val authRaw = e
        .join(hub.withColumnRenamed("__v", "__s"), "__s")
        .groupBy(col("__d"))
        .agg(pinnedSum(col("__s"), col("__h")).as("__raw"))
        .localCheckpoint()
      val authTot = authRaw
        .agg(pinnedSum(col("__d"), col("__raw")).as("__tot"))
      auth = nodes
        .join(authRaw, nodes("__v") === authRaw("__d"), "left")
        .crossJoin(broadcast(authTot))
        .select(col("__v"),
          (coalesce(col("__raw"), lit(0.0)) / col("__tot")).as("__a"))
        .localCheckpoint()
      val hubRaw = e
        .join(auth.withColumnRenamed("__v", "__d"), "__d")
        .groupBy(col("__s"))
        .agg(pinnedSum(col("__d"), col("__a")).as("__raw"))
        .localCheckpoint()
      val hubTot = hubRaw
        .agg(pinnedSum(col("__s"), col("__raw")).as("__tot"))
      hub = nodes
        .join(hubRaw, nodes("__v") === hubRaw("__s"), "left")
        .crossJoin(broadcast(hubTot))
        .select(col("__v"),
          (coalesce(col("__raw"), lit(0.0)) / col("__tot")).as("__h"))
        .localCheckpoint()
      i += 1
    }
    hub.join(auth.withColumnRenamed("__v", "__v2"),
        col("__v") === col("__v2"))
      .select(col("__v").as("node"), col("__h").as("hub"),
        col("__a").as("authority"))
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

  /** Label-propagation communities over the undirected view — the
    * community-detection rung between [[Dedup.connectedComponents]]
    * (which finds CONNECTED pieces) and nothing: inside one giant
    * connected crawl graph, LPA carves the mutual-linking
    * neighborhoods (site families, mirror farms, topical clusters)
    * that connectivity alone cannot see. Synchronous fixed-`rounds`
    * LPA with a DETERMINISTIC election: every node starts labeled
    * with its own id; each round every node adopts the label most
    * frequent among its neighbors AND itself — the self-vote is the
    * standard damping for synchronous LPA's bipartite oscillation (a
    * lone edge would otherwise swap labels forever; with it, the pair
    * converges to the smaller endpoint) — count ties broken by the
    * SMALLEST label (one `min(struct(−count, label))` per node —
    * exact integer lexicographic, engine-identical). Fixed rounds
    * rather than convergence-tested — deeper bipartite structure can
    * still cycle, and a fixed, deterministic round count is what an
    * oracle can replay; isolated nodes keep their own id (singleton
    * communities). Edge doctrine as everywhere in this file: NULL
    * endpoints and self-loops drop, direction erased, parallel edges
    * DISTINCT to one.
    *
    * Scale shape: per round one equi-join of the doubled edge list
    * with the |nodes| label frame + two hash-aggs (neighbor-label
    * counts, per-node election) + one keep-previous left join; label
    * frames pin through [[graft.ops.Ops.pinIterationState]] (the
    * bradleyTerry stats-squaring lesson — each round references the
    * label frame on both edge directions). `rounds` ≤ 20. Output:
    * `node, community`. */
  def labelPropagation(
      srcField: String, dstField: String, rounds: Int = 5)(
      edges: DataFrame): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"rounds must be in [1, 20], got $rounds")
    // canonicalize UNDIRECTED before doubling — a reciprocal pair
    // (a→b, b→a) must count as one neighbor relation, not two votes
    val e = edges
      .select(col(srcField).as("__a"), col(dstField).as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("__s"),
        greatest(col("__a"), col("__b")).as("__d"))
      .distinct()
      .localCheckpoint()
    val ends = e.select(col("__s").as("__v"), col("__d").as("__n"))
      .unionByName(e.select(col("__d").as("__v"), col("__s").as("__n")))
    val nodes = ends.select(col("__v")).distinct().localCheckpoint()
    // the self-vote rides the neighbor list as a (v, v) row
    val nbr = ends.unionByName(nodes.select(col("__v"), col("__v").as("__n")))
      .localCheckpoint()
    var labels = nodes.select(col("__v"), col("__v").as("__l"))
    var r = 0
    while (r < rounds) {
      val picked = nbr
        .join(labels.select(col("__v").as("__n"), col("__l")), "__n")
        .groupBy(col("__v"), col("__l"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("__v"))
        .agg(min(struct((-col("__c")).as("__nc"), col("__l").as("__lb")))
          .as("__pick"))
        .select(col("__v"), col("__pick.__lb").as("__new"))
      labels = graft.ops.Ops.pinIterationState(
        labels.join(picked, Seq("__v"), "left")
          .select(col("__v"), coalesce(col("__new"), col("__l")).as("__l")))
      r += 1
    }
    labels.select(col("__v").as("node"), col("__l").as("community"))
  }

  /** Newman modularity of a community assignment — the number that says
    * whether [[labelPropagation]] (or any clustering joined back onto
    * the nodes) actually found structure: `Q = Σ_c [e_c/m −
    * (d_c/2m)²]`, the within-community edge share minus what a random
    * degree-preserving rewiring would put there; Q ≈ 0 means the
    * "communities" are no better than chance, dense real structure
    * lands ~0.3–0.7.
    *
    * Contract: `labels` is `(node, community)` rows, one per node —
    * ENFORCED: exact duplicate rows collapse, a node labeled into two
    * communities raises (it would silently multiply edges through the
    * label joins and skew Q); edges whose endpoints are not BOTH
    * labeled drop from m and from degrees (partial labelings score
    * the labeled subgraph — stated, not guessed). Edge doctrine as everywhere: NULL/self drop,
    * undirected least/greatest canonicalization, parallel edges
    * DISTINCT to one.
    *
    * Exactness: e_c, d_c, m are exact integers; each community's
    * contribution is a fixed two-division expression, and the global Q
    * folds community-ordered — cross-engine hash-identical. One edge
    * scan + two label joins + two hash-aggs. EVERY community in
    * `labels` emits a row: `nodes` counts its LABELED nodes (edgeless
    * members included), a community with no kept edges carries zeros
    * and contribution 0, and an edge-free labeled graph scores Q = 0
    * (no structure to find, not NaN). Output per community:
    * `community, nodes, internal_edges, degree_sum, contribution`,
    * with the global `modularity` repeated on every row (the ECE
    * convention). */
  def modularity(labels: DataFrame)(edges: DataFrame): DataFrame = {
    require(labels.columns.length == 2,
      s"labels must be (node, community) rows, got ${labels.columns.mkString(", ")}")
    // the one-row-per-node contract is ENFORCED, not assumed: exact
    // duplicate (node, community) rows collapse harmlessly (distinct),
    // but a node labeled into TWO communities would multiply edges
    // through the two equi-joins below — silently inflating m,
    // internal_edges and degree_sum — so it fails loudly instead.
    // Cost: one |labels|-sized hash-agg; min() is only the carrier of
    // the (unique) surviving community, never a silent pick.
    val lab = labels.select(col(labels.columns(0)).as("__v"),
      col(labels.columns(1)).as("__c"))
      .filter(col("__v").isNotNull && col("__c").isNotNull)
      .distinct()
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__k"), min(col("__c")).as("__cm"))
      .select(col("__v"),
        when(col("__k") > 1, raise_error(concat(
          lit("modularity: node "), col("__v").cast("string"),
          lit(" is labeled into multiple communities — the labels " +
            "contract is one row per node")))
          .cast(labels.schema(labels.columns(1)).dataType))
          .otherwise(col("__cm")).as("__c"))
      .localCheckpoint()
    val e = edges
      .select(col(edges.columns(0)).as("__a"), col(edges.columns(1)).as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("__s"),
        greatest(col("__a"), col("__b")).as("__d"))
      .distinct()
      .join(lab.select(col("__v").as("__s"), col("__c").as("__cs")), "__s")
      .join(lab.select(col("__v").as("__d"), col("__c").as("__cd")), "__d")
      .localCheckpoint() // feeds m, degrees, AND internal counts
    val m = e.agg(count(lit(1)).as("__m"))
    // nodes per community come from the LABELS frame, not the edge
    // endpoints — edgeless members count, and a community with no
    // kept edges still emits its (zeroed) row
    val commNodes = lab.groupBy(col("__c"))
      .agg(countDistinct(col("__v")).as("nodes"))
    val deg = e.select(col("__s").as("__v"), col("__cs").as("__c"))
      .unionByName(e.select(col("__d").as("__v"), col("__cd").as("__c")))
      .groupBy(col("__c"))
      .agg(count(lit(1)).as("degree_sum"))
    val internal = e.filter(col("__cs") === col("__cd"))
      .groupBy(col("__cs").as("__c"))
      .agg(count(lit(1)).as("internal_edges"))
    val perC = commNodes
      .join(deg, Seq("__c"), "left")
      .join(internal, Seq("__c"), "left")
      .select(col("__c"), col("nodes"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        coalesce(col("degree_sum"), lit(0L)).as("degree_sum"))
      .crossJoin(broadcast(m))
      .withColumn("contribution",
        when(col("__m") === 0L, lit(0.0)).otherwise(
          col("internal_edges").cast("double") / col("__m").cast("double") -
            (col("degree_sum").cast("double") /
              (lit(2.0) * col("__m").cast("double"))) *
            (col("degree_sum").cast("double") /
              (lit(2.0) * col("__m").cast("double")))))
    val q = perC.agg(org.apache.spark.sql.functions.aggregate(
      sort_array(collect_list(struct(col("__c").as("__k"),
        col("contribution").as("__t")))),
      lit(0.0), (acc, x) => acc + x.getField("__t")).as("modularity"))
    perC.crossJoin(broadcast(q))
      .select(col("__c").as("community"), col("nodes"),
        col("internal_edges"), col("degree_sum"), col("contribution"),
        col("modularity"))
  }

  /** k-truss extraction by rounds-bounded support peeling — [[kCore]]'s
    * EDGE-level sibling and the stricter cohesion cut: the k-truss is
    * the maximal subgraph where every EDGE closes ≥ k−2 triangles, so
    * membership needs witnesses (common neighbors), not just degree —
    * a star hub sails through k-core and dies here, which is exactly
    * the link-farm / drive-by-link distinction crawl curation wants.
    * Each round recomputes every surviving edge's triangle support in
    * the CURRENT subgraph and drops edges below k−2; at a fixpoint the
    * survivors are the k-truss.
    *
    * The [[kCore]] honesty contract, verbatim: `rounds` is FIXED (an
    * oracle can replay a fixed count), peeling is monotone, and the
    * per-row `converged` flag distinguishes "this IS the truss" from
    * "a strict supergraph — raise rounds". Edge doctrine as everywhere
    * in this file: NULL endpoints and self-loops drop, direction
    * erased, parallel edges DISTINCT to one.
    *
    * Exactness: supports are exact integer triangle counts; no float
    * anywhere — and they are MAINTAINED, not recomputed: round 0 pays
    * ONE full oriented wedge enumeration (Σ outdeg², the
    * [[triangleStats]] orientation — hub-proof); every later round
    * only enumerates the triangles DESTROYED by that round's peel
    * front (common neighbors of each peeled edge's endpoints, deduped
    * on the sorted vertex triple so a triangle losing 2–3 edges still
    * decrements once) and subtracts them from the survivors' carried
    * supports. Support in the survivor graph = support in the previous
    * graph minus destroyed witnesses — exact integers, so the
    * maintained counts are BIT-IDENTICAL to a full recomputation
    * (property-spec-pinned). Per-round cost is peel-front-proportional
    * (Σ_{(a,b)∈peeled} deg(a) candidate rows + one hash-agg), not
    * graph-proportional — at 100× the post-front rounds are no longer
    * the bill. A round that peels nothing IS the fixpoint (monotone
    * peeling), so the loop stops early — output unchanged (further
    * rounds are no-ops), the remaining wedge enumerations simply never
    * run; `converged` still reads off the final supports. Survivor
    * frames pin through [[graft.ops.Ops.pinIterationState]]; the
    * early-stop check is one cheap scan of the pinned frame per round.
    * Output per surviving edge: `node_a < node_b, support` (support in
    * the final induced subgraph) + the global `converged`. */
  def kTruss(srcField: String, dstField: String, k: Int,
      rounds: Int = 10)(edges: DataFrame): DataFrame = {
    require(k >= 3 && k <= 1000000, s"k must be in [3, 1e6], got $k")
    require(rounds >= 1 && rounds <= 30,
      s"rounds must be in [1, 30], got $rounds")
    val minSup = (k - 2).toLong
    val e0 = edges
      .select(col(srcField).as("__a"), col(dstField).as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("__s"),
        greatest(col("__a"), col("__b")).as("__d"))
      .distinct()
      .localCheckpoint()
    // round 0: the one full enumeration seeds every edge's support
    // (edges in no triangle carry an honest 0)
    var cur = graft.ops.Ops.pinIterationState(
      e0.join(trussSupport(e0), Seq("__s", "__d"), "left")
        .select(col("__s"), col("__d"),
          coalesce(col("__sup"), lit(0L)).as("__sup")))
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val peeled = cur.filter(col("__sup") < minSup)
      if (peeled.isEmpty) {
        // monotone peeling: an empty front now means empty forever —
        // the fixpoint is reached and later rounds are no-ops
        stable = true
      } else {
        val surv = cur.filter(col("__sup") >= minSup)
        val ends = cur.select(col("__s").as("__v"), col("__d").as("__n"))
          .unionByName(
            cur.select(col("__d").as("__v"), col("__s").as("__n")))
        // triangles of the CURRENT graph holding >= 1 peeled edge:
        // candidates are each peeled edge's s-side neighbors, the
        // closing (d, c) edge decided by one semi-join; dedup on the
        // sorted triple (a triangle losing 2-3 edges at once is found
        // via each, but must decrement its survivors exactly once)
        val tris = peeled
          .join(ends.select(col("__v").as("__s"), col("__n").as("__c")),
            Seq("__s"))
          .filter(col("__c") =!= col("__d"))
          .select(col("__s"), col("__d"), col("__c"),
            least(col("__d"), col("__c")).as("__x"),
            greatest(col("__d"), col("__c")).as("__y"))
          .join(cur.select(col("__s").as("__x"), col("__d").as("__y")),
            Seq("__x", "__y"), "left_semi")
          .withColumn("__srt",
            array_sort(array(col("__s"), col("__d"), col("__c"))))
          .select(element_at(col("__srt"), 1).as("__t1"),
            element_at(col("__srt"), 2).as("__t2"),
            element_at(col("__srt"), 3).as("__t3"))
          .distinct()
        // each destroyed triangle takes one witness from each of its
        // three edges; only survivors still carry a support to lose
        val loss = tris
          .select(explode(array(
            struct(col("__t1").as("__s"), col("__t2").as("__d")),
            struct(col("__t1").as("__s"), col("__t3").as("__d")),
            struct(col("__t2").as("__s"), col("__t3").as("__d"))))
            .as("__e"))
          .groupBy(col("__e.__s").as("__s"), col("__e.__d").as("__d"))
          .agg(count(lit(1)).as("__loss"))
        cur = graft.ops.Ops.pinIterationState(
          surv.join(loss, Seq("__s", "__d"), "left")
            .select(col("__s"), col("__d"),
              (col("__sup") - coalesce(col("__loss"), lit(0L)))
                .as("__sup")))
      }
      r += 1
    }
    val conv = cur.agg(
      coalesce(min(col("__sup") >= minSup), lit(true)).as("converged"))
    cur.crossJoin(broadcast(conv))
      .select(col("__s").as("node_a"), col("__d").as("node_b"),
        col("__sup").as("support"), col("converged"))
  }

  /** Full oriented triangle-support enumeration over a canonical
    * (`__s < __d`, distinct) edge frame — [[kTruss]]'s round-0 seed and
    * the spec's cross-check that maintained supports match a fresh
    * recomputation. Degree-ordered orientation (the [[triangleStats]]
    * design): each triangle is enumerated EXACTLY ONCE from its
    * lowest-(degree, id) apex, then credited to all three of its
    * edges. Wedge volume drops from Σ deg² to Σ outdeg² — the
    * difference between a hub exploding the join (power-law graphs)
    * and not. Emits only edges in >= 1 triangle: `__s, __d, __sup`. */
  private[graft] def trussSupport(cur: DataFrame): DataFrame = {
      val ends = cur.select(col("__s").as("__v"), col("__d").as("__n"))
        .unionByName(cur.select(col("__d").as("__v"), col("__s").as("__n")))
      val deg = ends.groupBy(col("__v")).agg(count(lit(1)).as("__deg"))
      val oriented = ends
        .join(deg.select(col("__v"), col("__deg").as("__dv")), Seq("__v"))
        .join(deg.select(col("__v").as("__n"), col("__deg").as("__dn")),
          Seq("__n"))
        .filter(col("__dv") < col("__dn") ||
          (col("__dv") === col("__dn") && col("__v") < col("__n")))
        .select(col("__v"), col("__n"), col("__dn"))
      // wedges (a→b, a→c) with b strictly before c in the SAME
      // (degree, id) order the orientation uses, so the closing edge
      // can only be oriented b→c — one equi-semi-join decides it
      val wedges = oriented
        .select(col("__v").as("__a"), col("__n").as("__b"),
          col("__dn").as("__db"))
        .join(oriented.select(col("__v").as("__a"), col("__n").as("__c"),
          col("__dn").as("__dc")), Seq("__a"))
        .filter(col("__db") < col("__dc") ||
          (col("__db") === col("__dc") && col("__b") < col("__c")))
      val triangles = wedges
        .join(oriented.select(col("__v").as("__b"), col("__n").as("__c")),
          Seq("__b", "__c"), "left_semi")
      triangles
        .select(explode(array(
          struct(least(col("__a"), col("__b")).as("__s"),
            greatest(col("__a"), col("__b")).as("__d")),
          struct(least(col("__a"), col("__c")).as("__s"),
            greatest(col("__a"), col("__c")).as("__d")),
          struct(least(col("__b"), col("__c")).as("__s"),
            greatest(col("__b"), col("__c")).as("__d")))).as("__e"))
        .groupBy(col("__e.__s").as("__s"), col("__e.__d").as("__d"))
        .agg(count(lit(1)).as("__sup"))
  }

  /** k-core extraction by rounds-bounded peeling — the density filter
    * of crawl/link curation: the k-core is the maximal subgraph where
    * every node keeps ≥ k neighbors, the standard cut between a
    * connected-but-thin periphery (drive-by links, link farms' leaf
    * spam) and the cohesive center worth crawling/trusting. Each round
    * drops every node whose degree in the CURRENT subgraph is < k;
    * at a fixpoint the survivors are exactly the k-core.
    *
    * Like [[labelPropagation]], `rounds` is FIXED rather than
    * convergence-tested — a deterministic round count is what an
    * oracle can replay. The `converged` flag (repeated per row, the
    * modularity convention) says whether the fixpoint was reached: when
    * true the output IS the k-core; when false it is a strict
    * supergraph of it (peeling is monotone — nodes only leave), so
    * `converged=false` means "raise rounds", never a wrong core.
    * Peeling cascades one "layer" per round, so rounds needed = the
    * peel depth, tiny for real link graphs (hubs hold cores together);
    * `rounds` ≤ 30. Edge doctrine as everywhere in this file:
    * NULL endpoints and self-loops drop, direction erased, parallel
    * edges DISTINCT to one.
    *
    * Exactness: degrees are exact integers; there is no float
    * anywhere. Scale shape: per round one semi-join of the doubled
    * edge list against the surviving-node frame on BOTH endpoints +
    * one hash-agg; survivor frames pin through
    * [[graft.ops.Ops.pinIterationState]] (each round references the
    * frame on both edge directions). A round that peels no node IS
    * the fixpoint (monotone peeling) and stops the loop early —
    * output unchanged, the post-front rounds simply never run (the
    * [[kTruss]] discipline; one count() per round on the pinned
    * frame). Output: `node, degree` (degree in
    * the final induced subgraph) + the global `converged`. */
  def kCore(srcField: String, dstField: String, k: Int, rounds: Int = 10)(
      edges: DataFrame): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k must be in [1, 1e6], got $k")
    require(rounds >= 1 && rounds <= 30,
      s"rounds must be in [1, 30], got $rounds")
    val e = edges
      .select(col(srcField).as("__a"), col(dstField).as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("__s"),
        greatest(col("__a"), col("__b")).as("__d"))
      .distinct()
      .localCheckpoint()
    val ends = e.select(col("__s").as("__v"), col("__d").as("__n"))
      .unionByName(e.select(col("__d").as("__v"), col("__s").as("__n")))
      .localCheckpoint()
    var alive = graft.ops.Ops.pinIterationState(
      ends.select(col("__v")).distinct())
    // early stop at the fixpoint (the kTruss discipline): survivors
    // only shrink, so an unchanged COUNT means an unchanged set and
    // every later round is a no-op — one cheap count() per round on
    // the pinned frame buys skipping the post-front semi-joins
    var prevCount = alive.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      alive = graft.ops.Ops.pinIterationState(
        ends
          .join(alive.select(col("__v")), Seq("__v"), "left_semi")
          .join(alive.select(col("__v").as("__n")), Seq("__n"), "left_semi")
          .groupBy(col("__v"))
          .agg(count(lit(1)).as("__deg"))
          .filter(col("__deg") >= k)
          .select(col("__v")))
      val c = alive.count()
      if (c == prevCount) stable = true
      prevCount = c
      r += 1
    }
    // degree in the FINAL induced subgraph (not the pre-peel degree
    // that admitted the node), and the fixpoint check off the same
    // frame: converged ⇔ every survivor still holds ≥ k neighbors
    // among survivors. A survivor isolated by the last peel has no
    // degree row — coalesce to 0 so it honestly fails the check.
    val finalDeg = ends
      .join(alive.select(col("__v")), Seq("__v"), "left_semi")
      .join(alive.select(col("__v").as("__n")), Seq("__n"), "left_semi")
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__deg"))
    val out = alive
      .join(finalDeg, Seq("__v"), "left")
      .select(col("__v"), coalesce(col("__deg"), lit(0L)).as("degree"))
    val conv = out.agg(
      coalesce(min(col("degree") >= k), lit(true)).as("converged"))
    out.crossJoin(broadcast(conv))
      .select(col("__v").as("node"), col("degree"), col("converged"))
  }
}
