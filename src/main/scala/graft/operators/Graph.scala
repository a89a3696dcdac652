package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics: PageRank (Brin & Page 1998) in EXACT
  * fixed-point integer arithmetic.
  *
  * Why fixed-point: a double-valued PageRank sums contributions in
  * shuffle order — results drift across parallelism and engines. Here
  * rank mass is an integer budget (10^12 micro-units) and every
  * operation is integer div/mul/sum: bit-identical at any parallelism
  * AND replicable as unrolled DuckDB CTEs, so a 3-iteration run is
  * hash-comparable, not just "close". Integer-division dust (≤1 unit
  * per share) leaks mass slightly — deterministically — which is the
  * price of exactness; ordering quality is unaffected.
  *
  * Shape at scale: per iteration, one join of edges⋈ranks (shuffle on
  * src — co-partitioned with the degree join) + one sum aggregate on
  * dst. Ranks are `localCheckpoint`ed every THIRD iteration (and on
  * the last, so the returned frame is flat and the edge caches can be
  * released eagerly): each checkpoint is an extra eager
  * materialization of a tiny frame, so cutting their count cuts that
  * fixed cost while lineage never spans more than three hops — the
  * convergence math is unchanged.
  *
  * Overflow bound: rank ≤ 10^12 total mass, rank·dampNum ≤ 8.5·10^13,
  * and 10^2·deg stays far inside int64 for any realistic degree.
  */
object Graph {

  val TotalMass = 1000000000000L // 10^12 micro-units of rank

  /** `edges` must be SYMMETRIC (both directions present, distinct) with
    * columns (src, dst); every node must appear as a src (true for
    * symmetric edge sets). Returns (id, rank) after `iters` damped
    * iterations; rank is the exact integer micro-unit value.
    */
  def pageRankFixed(edges: DataFrame, iters: Int,
                    dampNum: Int = 85, dampDen: Int = 100): DataFrame =
    dampedIterate(edges, iters, dampNum, dampDen) { (nodes, teleport) =>
      val nn = broadcast(nodes.groupBy().agg(count(lit(1)).as("n")))
      nodes.crossJoin(nn)
        .select(col("id"),
          call_function("div", lit(TotalMass), col("n")).as("r0"),
          call_function("div", lit(teleport), col("n")).as("base"))
    }

  /** PERSONALIZED PageRank / TrustRank (Gyöngyi, Garcia-Molina,
    * Pedersen 2004): identical damped iteration, but ALL teleport mass
    * returns to the `seeds` set instead of spreading uniformly — rank
    * becomes "trust flowing out of the seeds through the link
    * structure", the standard seed-propagation scorer for corpus
    * curation (trusted-domain expansion) and entity relevance. Same
    * exact integer arithmetic and per-iteration shape as
    * [[pageRankFixed]]; off-graph seeds still count in the teleport
    * denominator (deterministically) but hold no mass.
    */
  def pageRankPersonalizedFixed(edges: DataFrame, seeds: DataFrame,
                                iters: Int, dampNum: Int = 85,
                                dampDen: Int = 100): DataFrame =
    dampedIterate(edges, iters, dampNum, dampDen) { (nodes, teleport) =>
      val sd = seeds.select(col("id")).distinct()
      val sn = broadcast(sd.groupBy().agg(count(lit(1)).as("s")))
      nodes.join(sd.withColumn("is_seed", lit(true)), Seq("id"), "left")
        .crossJoin(sn)
        .select(col("id"),
          when(col("is_seed"),
            call_function("div", lit(TotalMass), col("s")))
            .otherwise(lit(0L)).as("r0"),
          when(col("is_seed"),
            call_function("div", lit(teleport), col("s")))
            .otherwise(lit(0L)).as("base"))
    }

  /** The shared damped fixed-point loop. `mkBase` builds the invariant
    * (id, r0, base) frame from the node set and the total teleport
    * budget `total·(1−d)`; everything else — invariant hoisting, the
    * one-join-one-agg iteration, 3-hop checkpoint cadence, cache
    * release — is identical for uniform and personalized variants.
    */
  private def dampedIterate(edges: DataFrame, iters: Int,
                            dampNum: Int, dampDen: Int)(
      mkBase: (DataFrame, Long) => DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    // Loop-INVARIANT frames, built once (the round-4 verdict's hygiene
    // fix — these were re-derived every iteration before):
    //  - edgeDeg: out-degree pre-joined onto edges, so the loop's only
    //    src-side join is edges⋈ranks;
    //  - baseRanks: (id, r0, base), checkpointed flat.
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgeDeg = e.join(deg, Seq("src")).persist()
    // node set = deg's keys exactly (every node appears as a src) — a
    // projection of the aggregate already computed, instead of a second
    // full shuffle of the edge set through distinct()
    val nodes = deg.select(col("src").as("id"))
    // (probed: repartitioning baseRanks by id before the checkpoint
    // does NOT survive localCheckpoint under AQE — the left join
    // re-exchanges the scan regardless — so no pre-partitioning here;
    // the contrib side already reaches the join exchange-free via
    // alias-aware propagation from its dst aggregation.)
    val baseRanks =
      mkBase(nodes, TotalMass * (dampDen - dampNum) / dampDen).localCheckpoint()
    var ranks = baseRanks.select(col("id"), col("r0").as("rank"))
    for (i <- 1 to iters) {
      // per iteration: ONE join (edgeDeg⋈ranks) + ONE sum on dst,
      // then the left join back onto the flat invariant base frame
      val contrib = edgeDeg
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          call_function("div", col("rank") * dampNum,
            col("deg") * dampDen).as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("inflow"))
      ranks = baseRanks
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), (col("base") + coalesce(col("inflow"), lit(0L))).as("rank"))
      if (i % 3 == 0 || i == iters)
        ranks = ranks.localCheckpoint() // truncate lineage every 3rd hop
      // (the final checkpoint also lets the edge caches release below
      // without exposing the consumer to an uncached recompute)
    }
    e.unpersist()
    edgeDeg.unpersist()
    ranks
  }

  /** Multi-source BFS: minimum hop count from ANY seed, by level-
    * synchronous frontier expansion — the distributed shortest-path
    * primitive (influence radius, blast-radius queries, graph-distance
    * features). Seeds emit hops 0 whether or not they appear in the
    * edge set.
    *
    * Shape at scale: per level, ONE equi-join frontier⋈edges (shuffle
    * keyed on src) + distinct + LEFT ANTI against ONE accumulated
    * `visited` frame that is unioned incrementally and
    * `localCheckpoint`ed each level — lineage stays flat and the
    * per-level anti-join scans the visited set ONCE, not once per
    * prior level (the round-6 rebuild re-scanned every checkpointed
    * level each round: O(V·depth) total anti-join input on deep
    * graphs). Per-level cost is frontier edge cut + |visited| — the
    * anti-join term is inherent to level-synchronous BFS; the loop
    * stops early on an empty frontier (one cheap `isEmpty` per level
    * on an already-materialized frame). Integer hop labels — nothing
    * to drift.
    *
    * Input: symmetric directed edge list (src, dst); seeds (id).
    * Output: (id, hops) for every node within `maxHops` of a seed.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val level0 = seeds.select(col("id")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint()
    // `visited` carries hops too, so it doubles as the accumulated
    // RESULT — checkpointing it per level materializes exactly the
    // rows the final answer needs, nothing extra.
    var visited = level0
    var frontier = level0.select(col("id"))
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val next = frontier.withColumnRenamed("id", "src")
        .join(e, Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited.select(col("id")), Seq("id"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        visited = visited.unionByName(next).localCheckpoint()
        frontier = next.select(col("id"))
        h += 1
      }
    }
    e.unpersist()
    visited
  }

  /** k-core decomposition by iterative peeling (Seidman 1983; the
    * Batagelj-Zaveršnik distributed variant): repeatedly drop nodes of
    * degree < k together with their edges until the fixpoint — the
    * surviving subgraph is the UNIQUE maximal subgraph with every
    * degree ≥ k (peeling is confluent, so round structure cannot change
    * the answer — what makes a fixed-unroll oracle valid). The standard
    * "dense cohesive region" extractor for community/spam analysis.
    *
    * Shape at scale: per round ONE degree aggregate + two semi-joins of
    * the edge set against the survivor ids — all equi-joins keyed on
    * node id; the edge frame is checkpointed per round so lineage stays
    * flat and the convergence check is a count on materialized data.
    * Rounds are bounded by the degeneracy ordering depth — small on
    * real graphs — and `maxRounds` throws rather than silently
    * mis-converging (the clusterPairs rule).
    *
    * Input: distinct undirected edges (a, b), a < b, no self-loops.
    * Output: (id, core_deg) for every node of the k-core, with its
    * within-core degree.
    */
  def kCore(edgesAB: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    var e = edgesAB.select(col("a"), col("b")).localCheckpoint()
    var n = e.count()
    var converged = false
    var round = 0
    def degrees(edges: DataFrame) =
      edges.select(col("a").as("id"))
        .unionByName(edges.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    while (!converged && round < maxRounds) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("id"))
      val e2 = e.join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
      val n2 = e2.count()
      converged = n2 == n
      e = e2; n = n2; round += 1
    }
    if (!converged)
      throw new IllegalStateException(s"k-core did not converge in $maxRounds rounds")
    degrees(e).withColumnRenamed("deg", "core_deg")
  }

  /** Exact triangle enumeration by DEGREE-ORDERED edge orientation
    * (the "forward" / node-iterator++ algorithm, Schank & Wagner 2005):
    * orient every undirected edge from its lower-(degree, id) endpoint
    * to the higher; each triangle {u,v,w} (ordered u<v<w) then appears
    * exactly once as the wedge u→v, u→w closed by v→w. The orientation
    * is the scale guarantee: max out-degree is O(√m) on ANY graph, so
    * the wedge self-join cannot explode on skewed hubs — the naive
    * wedge count Σ deg² (quadratic in a celebrity node's degree)
    * becomes Σ outdeg² ≤ m·√m.
    *
    * All three steps are equi-joins (degree join, wedge join on src,
    * closing-edge join on (b, c)); ordering uses exact integer (deg,
    * id) pairs — no RNG, no doubles, bit-stable everywhere.
    *
    * Input: distinct undirected edges (a, b) with a < b, no
    * self-loops. Output: one row (x, y, z) per triangle, endpoints in
    * orientation order.
    */
  def triangles(edgesAB: DataFrame): DataFrame = {
    val und = edgesAB.select(col("a"), col("b"))
      .unionByName(edgesAB.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
    val aLower = col("dega") < col("degb") ||
      (col("dega") === col("degb") && col("a") < col("b"))
    val e = edgesAB
      .join(deg.select(col("id").as("a"), col("deg").as("dega")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("degb")), Seq("b"))
      .select(
        when(aLower, col("a")).otherwise(col("b")).as("src"),
        when(aLower, col("b")).otherwise(col("a")).as("dst"),
        when(aLower, col("degb")).otherwise(col("dega")).as("ddeg"))
      .localCheckpoint() // three consumers below; keep the degree joins single-run
    // self-join via aliases (NOT per-side renamed projections): both
    // sides are the identical scan shuffled on src, so ReuseExchange
    // collapses them to ONE exchange of e
    val wedges = e.as("l").join(e.as("m"), col("l.src") === col("m.src"))
      .filter(col("l.ddeg") < col("m.ddeg") ||
        (col("l.ddeg") === col("m.ddeg") && col("l.dst") < col("m.dst")))
      .select(col("l.src").as("x"), col("l.dst").as("b"), col("m.dst").as("c"))
    wedges.join(e.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      .select(col("x"), col("b").as("y"), col("c").as("z"))
  }

  /** Weighted single/multi-source shortest paths by distributed
    * Bellman-Ford rounds (relax-to-fixpoint): per round, ONE equi-join
    * of the current distance frame against the edge list (shuffle keyed
    * on src) producing candidate `dist + w` labels, then one min
    * aggregate over (old ∪ candidates) — the weighted generalization of
    * [[bfsHops]]'s level expansion (BFS is the w≡1 special case whose
    * anti-join can prune; with weights a settled node can still
    * improve, so the min-agg IS the frontier logic). Distances are
    * exact INTEGER weights — no float accumulation, bit-stable at any
    * parallelism, and replicable by a path-enumerating recursive CTE
    * with a min aggregate (the g05 oracle pattern + weights).
    *
    * Shape at scale: each round touches |dist| + |edges| rows in
    * equi-joins only; the frame is `localCheckpoint`ed per round (flat
    * lineage — the iterative-loop rule) and convergence is ONE
    * left-anti join on the materialized frames (no change ⇒ fixpoint).
    * Rounds are bounded by the hop count of the deepest shortest path;
    * `maxRounds` throws rather than silently returning unconverged
    * distances (the clusterPairs rule). Negative edges are rejected up
    * front — with non-negative weights Bellman-Ford converges in ≤ |V|
    * rounds and the fixpoint is the unique shortest-path labeling.
    *
    * Input: directed weighted edges (src, dst, w: long ≥ 0); seeds
    * (id). Output: (id, dist) for every node reachable from any seed.
    */
  def ssspWeighted(edges: DataFrame, seeds: DataFrame,
                   maxRounds: Int = 30): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .persist()
    if (e.filter(col("w") < 0).limit(1).count() > 0) {
      e.unpersist()
      throw new IllegalArgumentException("ssspWeighted: negative edge weight")
    }
    var dist = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val cand = dist.withColumnRenamed("id", "src")
        .join(e, Seq("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionByName(cand)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      // fixpoint ⇔ no (id, dist) row changed: `next` is pointwise ≤
      // `dist` and can only add ids, so anti-join emptiness decides
      converged = next.join(dist, Seq("id", "dist"), "left_anti").isEmpty
      dist = next
      round += 1
    }
    e.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"ssspWeighted did not converge in $maxRounds rounds")
    dist
  }

  /** [[ssspWeighted]] carrying the ARGMIN PREDECESSOR: each node's row
    * is the lexicographic minimum of `struct(dist, parent)` over every
    * relaxation candidate — so ties on distance break to the smallest
    * predecessor id, a total order making the whole parent forest
    * deterministic (and therefore oracle-replayable). Seeds are their
    * own parent. Same loop shape as g08: one equi-join + one min-agg
    * per round, anti-join fixpoint on the (id, dist, parent) rows.
    *
    * Weights must be STRICTLY positive (not just non-negative as in
    * [[ssspWeighted]]): under zero-weight ties two nodes can each be
    * the other's argmin predecessor and the parent graph cycles —
    * rejecting w ≤ 0 guarantees parents strictly decrease `dist`, so
    * the forest is acyclic and every chain ends at a seed.
    */
  def ssspWithParents(edges: DataFrame, seeds: DataFrame,
                      maxRounds: Int = 30): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .persist()
    if (e.filter(col("w") <= 0).limit(1).count() > 0) {
      e.unpersist()
      throw new IllegalArgumentException(
        "ssspWithParents: edge weights must be > 0 (zero-weight ties can " +
          "make the argmin-parent graph cyclic)")
    }
    var dist = seeds.select(col("id")).distinct()
      .select(col("id"),
        struct(lit(0L).as("dist"), col("id").as("parent")).as("dp"))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val cand = dist
        .select(col("id").as("src"), col("dp.dist").as("d0"))
        .join(e, Seq("src"))
        .select(col("dst").as("id"),
          struct((col("d0") + col("w")).as("dist"),
            col("src").as("parent")).as("dp"))
      val next = dist.unionByName(cand)
        .groupBy(col("id")).agg(min(col("dp")).as("dp"))
        .localCheckpoint()
      converged = next.join(dist, Seq("id", "dp"), "left_anti").isEmpty
      dist = next
      round += 1
    }
    e.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"ssspWithParents did not converge in $maxRounds rounds")
    dist.select(col("id"), col("dp.dist").as("dist"), col("dp.parent").as("parent"))
  }

  /** Witness-path reconstruction over [[ssspWithParents]]' forest:
    * every labeled node walks its parent chain to the seed, emitting
    * (id, dist, parent, path) with `path` the full node sequence from
    * seed to node. Pointer-FOLLOWING, not doubling, on purpose: chain
    * length ≤ the relaxation round count, so reconstruction costs the
    * same O(diameter) supersteps the distance fixpoint already paid —
    * two node-sized equi-joins per round, nothing wider. Parents
    * strictly decrease `dist` (w > 0), so chains terminate at seeds.
    */
  def ssspPaths(edges: DataFrame, seeds: DataFrame,
                maxRounds: Int = 30): DataFrame = {
    val labeled = ssspWithParents(edges, seeds, maxRounds).persist()
    val parents = labeled.select(col("id").as("pid"), col("parent").as("pp"))
    var state = labeled
      .select(col("id"), col("dist"), col("parent"),
        col("id").as("head"), array(col("id")).as("path"))
      .localCheckpoint()
    var open = 1L
    var round = 0
    while (open > 0) {
      // +1: convergence is now detected one (pure no-op) round after
      // the last move, so a legal maxRounds-hop chain runs maxRounds+1
      // loop bodies — the thrown-at chain length is unchanged
      if (round > maxRounds + 1) {
        labeled.unpersist()
        throw new IllegalStateException(
          s"ssspPaths: a parent chain exceeds $maxRounds hops")
      }
      // `moved` records whether this row's chain advanced — the open
      // check below then counts rows on the ALREADY-materialized frame
      // instead of re-joining state⋈parents a second time per round
      // (was: one extra node-sized equi-join + shuffle every round).
      // A row is still open iff it moved this round: a row that didn't
      // move has head == its parent's fixpoint (a seed) and never moves
      // again, so `moved` and the old head-has-nonself-parent predicate
      // decide identically at every round boundary.
      state = state.join(parents, col("head") === col("pid"))
        .select(col("id"), col("dist"), col("parent"),
          when(col("pp") === col("head"), col("head"))
            .otherwise(col("pp")).as("head"),
          when(col("pp") === col("head"), col("path"))
            .otherwise(concat(array(col("pp")), col("path"))).as("path"),
          (col("pp") =!= col("head")).as("moved"))
        .localCheckpoint()
      open = state.filter(col("moved")).count()
      round += 1
    }
    labeled.unpersist()
    state.select(col("id"), col("dist"), col("parent"), col("path"))
  }
}
