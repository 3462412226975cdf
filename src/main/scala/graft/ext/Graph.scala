package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — join-based, no
  * GraphX, no driver-side adjacency state, so the same plan runs at
  * any scale the shuffle layer can carry.
  *
  * The connected-components counterpart lives in [[Dedup]] (it is the
  * dedup pair→cluster step); this object holds the rank/propagation
  * family.
  */
object Graph {

  /** Fixed-iteration PageRank: `rank_{t+1}(v) = (1-d) + d * (Σ_{u→v}
    * rank_t(u) / outdeg(u) [+ D_t / N])` with `rank_0 = 1` over every
    * node that appears as a source or destination.
    *
    * Dangling nodes (no out-edges): with `redistributeDangling =
    * false` (default) they contribute nothing — the simplified
    * formulation. With `true`, their aggregate rank mass `D_t` is
    * redistributed uniformly over all `N` nodes each round — the
    * canonical formulation (Page et al. 1999) whose total rank is
    * conserved on graphs with sinks. Both per-iteration results are
    * pure functions of the edge set, so an external oracle can replay
    * either exactly.
    *
    * Scale shape: the edge set is deduplicated, pre-joined with
    * out-degrees ONCE and checkpointed — each of the `iterations`
    * rounds is then one join (ranks onto edge sources) plus one keyed
    * aggregation (contributions by destination): two hash shuffles of
    * (id, double) pairs, independent of edge payload width. The
    * dangling variant adds ONE scalar aggregate per round (the
    * dangling-rank sum, a single-row frame cross-joined back — no
    * driver collect, no extra keyed shuffle). Ranks are locally
    * checkpointed per round so the lineage (and thus the plan) stays
    * O(1) instead of O(iterations). No broadcast of anything node- or
    * edge-sized.
    *
    * Determinism: per-destination contribution sums (and the dangling
    * mass) are double additions in shuffle order — round the FINAL
    * ranks (the caller's job) when comparing across engines;
    * intermediates are left unrounded, matching what an unrolled
    * relational replay computes. */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 5,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst",
      redistributeDangling: Boolean = false,
      seeds: Option[Seq[Long]] = None
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(seeds.forall(_.nonEmpty), "seeds must be non-empty when given")
    // dangling redistribution is formulated for the uniform restart;
    // with a seed restart the simplified decaying-mass form applies
    require(!(redistributeDangling && seeds.isDefined),
      "redistributeDangling is only defined for the uniform-restart formulation")
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().localCheckpoint()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — the loop-invariant message topology
    val withDeg = e0.join(deg, "src").localCheckpoint()
    val nodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct().localCheckpoint()
    // dangling = nodes with no out-edges; loop-invariant like withDeg
    val dangling =
      if (redistributeDangling)
        Some(nodes.join(deg, nodes("id") === deg("src"), "left_anti")
          .localCheckpoint())
      else None
    // N is loop-invariant; one bounded scalar to the driver, like a
    // dimension probe (only the dangling variant needs it)
    val nNodes = if (redistributeDangling) nodes.count().toDouble else 0.0
    // restart vector: uniform 1, or the seed indicator (a bounded
    // LITERAL membership predicate — never a join, never a broadcast)
    val restart: Column = seeds match {
      case Some(ss) =>
        when(col("id").isInCollection(ss), lit(1.0)).otherwise(lit(0.0))
      case None => lit(1.0)
    }
    var ranks = nodes.withColumn("r", restart)
    for (_ <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), (col("r") / col("outdeg")).as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      val joined = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
      val next = (dangling match {
        case Some(dang) =>
          // Σ dangling rank, one row (sum over an empty set is NULL →
          // 0); broadcast-cross-joined so every node sees D_t / N
          val dmass = ranks.join(dang.select(col("id")), "id")
            .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
          joined.crossJoin(broadcast(dmass))
            .select(col("id"),
              (lit(1.0 - damping) + lit(damping) *
                (coalesce(col("in_mass"), lit(0.0)) + col("dm") / lit(nNodes))).as("r"))
        case None =>
          // restart folds to the plain (1-d) constant when uniform
          joined.select(col("id"),
            (lit(1.0 - damping) * restart + lit(damping) *
              coalesce(col("in_mass"), lit(0.0))).as("r"))
      }).localCheckpoint()
      // round t's ranks have no consumer once round t+1 materializes
      // (release is a no-op on the round-0 ranks, a derived frame);
      // storage across the loop stays O(1) instead of O(iterations)
      graft.core.Lineage.release(ranks)
      ranks = next
    }
    // e0 fed withDeg/nodes at build time; the result references none
    graft.core.Lineage.release(e0 +: withDeg +: nodes +: dangling.toSeq: _*)
    ranks
  }

  /** Personalized PageRank (random walk with restart to a SEED set,
    * Jeh & Widom 2003): `rank_{t+1}(v) = (1-d)·s(v) + d·Σ_{u→v}
    * rank_t(u)/outdeg(u)` with `s(v) = 1` on seeds, 0 elsewhere, and
    * `rank_0 = s` — the similarity/recommendation ranking around a
    * query set. Dangling mass decays (the simplified formulation,
    * matching the default [[pageRank]]). The seed set is a bounded
    * LITERAL compiled into a codegen'd membership predicate — never a
    * join, never a broadcast frame. Per-iteration scale shape is
    * identical to [[pageRank]]: one keyed join (ranks onto edge
    * sources) + one keyed aggregation, ranks locally checkpointed for
    * O(1) lineage. */
  def personalizedPageRank(
      edges: DataFrame,
      seeds: Seq[Long],
      iterations: Int = 5,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame =
    pageRank(edges, iterations, damping, srcCol, dstCol,
      redistributeDangling = false, seeds = Some(seeds))

  /** Per-node degree profile over a DIRECTED edge multiset: out/in
    * degree and distinct-neighbor counts per node (nodes appearing
    * only as destination get outdeg 0, and vice versa). One full outer
    * join of two keyed aggregations — no windows, no broadcast of
    * anything node-sized; exact, so fully hash-oracle-able. */
  def degrees(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val out = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"), count_distinct(col("dst")).as("out_nbrs"))
    val in = e.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("indeg"), count_distinct(col("src")).as("in_nbrs"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        coalesce(col("out_nbrs"), lit(0L)).as("out_nbrs"),
        coalesce(col("indeg"), lit(0L)).as("indeg"),
        coalesce(col("in_nbrs"), lit(0L)).as("in_nbrs"))
  }

  /** Exact per-node triangle counts via degree-ordered orientation —
    * the standard distributed triangle algorithm (node-iterator++ /
    * the MapReduce form of Schank's forward algorithm): undirect +
    * dedup the edge set, orient every edge from the (degree, id)-
    * SMALLER endpoint to the larger, enumerate wedges by joining the
    * oriented list with itself on the pivot, and keep wedges whose
    * closing edge exists (one keyed semi-join). Each triangle is
    * found exactly once (its unique degree-minimum pivot), and the
    * orientation bounds per-pivot fan-out by the graph arboricity
    * (O(√m) wedges per edge worst-case) — the hot-key guard that
    * makes the wedge join survive skewed degree distributions at
    * 100 TB. Per-node counts then explode each triangle's 3 corners
    * into one keyed count.
    *
    * Shapes: every join is a keyed shuffle join on (id) or (node,
    * node) pairs of longs; nothing node- or edge-sized broadcasts;
    * output is exact, so fully hash-oracle-able. */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame =
    triangleCountsFromUnd(canonicalUnd(edges, srcCol, dstCol))

  /** Canonical undirected edge set — (lo, hi) pairs, self-loops
    * dropped, distinct — MATERIALIZED (r18): every consumer below uses
    * it in several plan branches, and unmaterialized each branch
    * re-executed the whole upstream edge derivation. */
  private def canonicalUnd(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()

  /** [[triangleCounts]] over a pre-canonicalized (materialized)
    * undirected edge set — shared with [[clusteringCoefficient]] so
    * the two never canonicalize twice. */
  private def triangleCountsFromUnd(und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // orient from (d, id)-smaller to larger: join degrees of both ends
    val du = deg.select(col("id").as("u"), col("d").as("du"))
    val dv = deg.select(col("id").as("v"), col("d").as("dv"))
    val lower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = und.join(du, "u").join(dv, "v")
      .select(
        when(lower, col("u")).otherwise(col("v")).as("lo"),
        when(lower, col("v")).otherwise(col("u")).as("hi"),
        // degree of the hi endpoint — wedge corners must be compared in
        // the SAME (deg, id) total order the orientation uses, or
        // triangles whose corner degree-order disagrees with id-order
        // are missed (the closing edge only exists as oriented(y, z)
        // when y precedes z in that order)
        when(lower, col("dv")).otherwise(col("du")).as("dhi"))
      // three consumers (both wedge sides + the closing-edge semi) —
      // materialized so the degree joins above run once (r18)
      .localCheckpoint()
    // wedges around the pivot: (lo -> hi1), (lo -> hi2) with hi1
    // preceding hi2 in (deg, id) order; the triangle closes iff
    // oriented edge (hi1 -> hi2) exists (the orientation is a total
    // order, so the closing edge can only point hi1 -> hi2)
    val w = oriented.as("e1").join(oriented.as("e2"),
        col("e1.lo") === col("e2.lo") &&
          struct(col("e1.dhi"), col("e1.hi")) < struct(col("e2.dhi"), col("e2.hi")))
      .select(col("e1.lo").as("x"), col("e1.hi").as("y"), col("e2.hi").as("z"))
    val tri = w.join(
      oriented.select(col("lo").as("y"), col("hi").as("z")).hint("shuffle_merge"),
      Seq("y", "z"), "left_semi")
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient: `2·T(v) / (d(v)·(d(v)−1))` — the
    * fraction of a node's neighbor pairs that are themselves
    * connected, for every node of the undirected graph (nodes in no
    * triangle get 0, degree-1 nodes get 0 by the `d ≥ 2` guard). The
    * standard community-density signal on top of [[triangleCounts]].
    *
    * Scale shape: the triangle side is the degree-oriented wedge join
    * above; the degree side is one keyed aggregation over the same
    * canonical edge set; the combine is a keyed left join on node id.
    * The coefficient itself is a 2-op IEEE chain on exact integers —
    * bit-identical cross-engine, no rounding needed. */
  def clusteringCoefficient(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    // ONE canonicalization shared by the degree side and the triangle
    // side (r18 — previously the full edge derivation ran again inside
    // triangleCounts)
    val und = canonicalUnd(edges, srcCol, dstCol)
    val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val tri = triangleCountsFromUnd(und)
    deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)).as("clust_coef"))
  }

  /** k-core of an undirected graph by fixed-round peeling: each round
    * drops nodes with degree < k and the edges touching them; after
    * `rounds` rounds the survivors (with their core-subgraph degrees)
    * are returned. Peeling is IDEMPOTENT once converged — a stable
    * graph loses nothing in further rounds — so a fixed unroll equals
    * the true k-core whenever convergence happens within `rounds`,
    * and an external oracle can replay the same unroll exactly
    * (no fixpoint test to synchronize). Callers pick `rounds` ≥ the
    * expected peel depth (degeneracy ordering peels shallow graphs in
    * 2-3 rounds; the fixture converges well inside the default 8).
    *
    * Scale shape mirrors [[pageRank]]: per round one keyed degree
    * aggregation + one semi-join per edge endpoint — keyed shuffles
    * of long pairs only, localCheckpoint per round for O(1) lineage;
    * no node- or edge-sized broadcast, no driver-side graph state. */
  def kCore(
      edges: DataFrame,
      k: Int,
      rounds: Int = 8,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      val deg = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("id")
      val next = e
        .join(keep.select(col("id").as("u")).hint("shuffle_merge"), Seq("u"), "left_semi")
        .join(keep.select(col("id").as("v")).hint("shuffle_merge"), Seq("v"), "left_semi")
        .select("u", "v").localCheckpoint()
      graft.core.Lineage.release(e)
      e = next
    }
    val out = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("core_degree"))
    out
  }

  /** Multi-source BFS hop distances: the exact shortest hop count
    * from the nearest of `seeds` to every node within `rounds` hops
    * of one (unreached nodes are absent — the frontier simply never
    * reached them). Each round is one relational min-plus step:
    * `d_r(v) = min(d_{r-1}(v), 1 + min_{u~v} d_{r-1}(u))` — distances
    * are monotone non-increasing and exact once settled, so the fixed
    * `rounds`-unroll IS the true ≤ rounds-hop BFS and an external
    * oracle replays the identical unroll (same contract as [[kCore]] /
    * [[labelPropagation]]).
    *
    * Scale shape: per round one keyed join (frontier onto edge
    * sources) + one keyed min aggregation over (current ∪ relaxed) —
    * two shuffles of (id, int) pairs; distances localCheckpoint per
    * round for O(1) lineage; seeds are a literal membership predicate,
    * never a join. */
  def shortestHops(
      edges: DataFrame,
      seeds: Seq[Long],
      rounds: Int = 4,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(seeds.nonEmpty, "shortestHops needs at least one seed")
    val und0 = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = und0.select(col("a").as("src"), col("b").as("dst"))
      .union(und0.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint()
    var dist = und.select(col("src").as("id")).distinct()
      .filter(col("id").isInCollection(seeds))
      .withColumn("dist", lit(0L)).localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = und
        .join(dist.select(col("id").as("src"), col("dist")), "src")
        .select(col("dst").as("id"), (col("dist") + 1L).as("dist"))
      val next = dist.union(relaxed)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint()
      graft.core.Lineage.release(dist)
      dist = next
    }
    graft.core.Lineage.release(und)
    dist
  }

  /** Synchronous label-propagation community detection (Raghavan et
    * al. 2007, deterministic variant): every node starts with its own
    * id as label; each round, every node adopts the most frequent
    * label among its neighbors' previous-round labels, ties broken by
    * the SMALLEST label. Synchronous updates + a total tie order make
    * every round a pure function of the edge set, so a fixed
    * `rounds`-unroll is externally replayable (same contract as
    * [[pageRank]] / [[kCore]] — no fixpoint test to synchronize; LPA
    * famously oscillates on bipartite structures, which a fixed
    * synchronous unroll replays faithfully rather than hides).
    *
    * Scale shape: per round one keyed join (labels onto edge sources,
    * both sides partitioned by node id) + one (dst, label) count
    * aggregation + one per-dst argmax via a single min-struct
    * aggregation — three keyed shuffles of long pairs, no window, no
    * broadcast of anything node-sized; labels localCheckpoint per
    * round for O(1) lineage. */
  def labelPropagation(
      edges: DataFrame,
      rounds: Int = 4,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // undirected message topology: both directions, self-loops dropped
    val und0 = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = und0.select(col("a").as("src"), col("b").as("dst"))
      .union(und0.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val next = und
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("n"))
        // argmax(n, tie -> min label) as one min-struct aggregation
        .groupBy("id")
        .agg(min(struct((-col("n")).as("negn"), col("label").as("l"))).as("m"))
        .select(col("id"), col("m.l").as("label"))
        .localCheckpoint()
      graft.core.Lineage.release(labels)
      labels = next
    }
    labels
  }

  /** Adamic–Adar link prediction: score every NON-adjacent pair (x, y)
    * sharing at least one neighbor by Σ_z 1/ln(deg z) over the common
    * neighbors z, and return the top-`topK` candidate links — the
    * classic common-neighbor heuristic (Adamic & Adar 2003), the
    * "entities that should probably be connected" primitive behind
    * record-linkage suggestions and recommendation seeds.
    *
    * `maxDeg` is the hot-pivot guard ([[Dedup.substringPairs]] maxDf
    * pattern): a pivot z contributes deg(z)² wedge pairs, so hub
    * nodes dominate cost quadratically at scale — and contribute the
    * LEAST signal (1/ln(deg) → 0). Pivots above `maxDeg` are dropped
    * before the wedge join, bounding fan-out at maxDeg² per pivot.
    *
    * Plan: adjacency (both directions) → degree agg → guarded pivot
    * weights → keyed wedge self-join on the pivot → anti-join the
    * existing edge set → keyed score sum → TakeOrderedAndProject
    * top-k (bounded heap, never a global sort). Scores round to 6 dp
    * BEFORE ranking with an (x, y) tie-break, so the ranking is
    * deterministic and replayable cross-engine (ln and the sum drift
    * in the last ulp; the round collapses the band). */
  def adamicAdar(
      edges: DataFrame,
      maxDeg: Int = 64,
      topK: Int = 50,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // und feeds the adjacency (twice) and the existing-edge anti-join;
    // wadj feeds both sides of the wedge self-join — materialize each
    // once (r18) so the upstream edge derivation (for the co-occurrence
    // graph, a lineitem distinct+self-join) runs once, not 4-8 times
    val und = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    val adj = und.select(col("u").as("z"), col("v").as("x"))
      .union(und.select(col("v").as("z"), col("u").as("x")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("d"))
    // pivot weights: deg >= 2 (a 1-neighbor pivot closes no wedge) and
    // the maxDeg hub guard
    val pivots = deg.filter(col("d") >= 2 && col("d") <= maxDeg)
      .select(col("z"), (lit(1.0) / log(col("d").cast("double"))).as("w"))
    val wadj = adj.join(pivots.hint("shuffle_merge"), "z").localCheckpoint()
    val wedges = wadj.as("a")
      .join(wadj.as("b").hint("shuffle_merge"),
        col("a.z") === col("b.z") && col("a.x") < col("b.x"))
      .select(col("a.x").as("x"), col("b.x").as("y"), col("a.w").as("w"))
    val newPairs = wedges.join(
      und.select(col("u").as("x"), col("v").as("y")).hint("shuffle_merge"),
      Seq("x", "y"), "left_anti")
    newPairs.groupBy("x", "y")
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col("x"), col("y"))
      .limit(topK)
  }

  /** Newman modularity `Q = Σ_c (L_c/m − (D_c/2m)²)` of a community
    * assignment over an undirected graph — the quality score that
    * tells you whether [[labelPropagation]]'s communities beat random
    * (Q ≈ 0) structure. `labels` carries (id, label).
    *
    * Scale shape: canonical edge set + two keyed joins to attach
    * labels, one count per community for intra edges, one keyed sum of
    * degrees per community, and the community-term relation (bounded
    * by community count) folds in a single-row aggregate; `m` rides a
    * single-row broadcast, never a driver collect. Per-community terms
    * are exact-int divisions (bit-identical); the final sum across
    * communities rounds to 6 dp. */
  def modularity(
      edges: DataFrame,
      labels: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      idCol: String = "id",
      labelCol: String = "label"
  ): DataFrame = {
    // und feeds three branches (edge count, degrees, label attach);
    // materialized so the canonicalize+distinct shuffle — and whatever
    // subtree produced `edges` — runs once, not three times (r18)
    val und = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    val lab = labels.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("lbl"))
    val mRow = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val withLab = und
      .join(lab.select(col("id").as("u"), col("lbl").as("lu")), Seq("u"))
      .join(lab.select(col("id").as("v"), col("lbl").as("lv")), Seq("v"))
    val intra = withLab.filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("c")).agg(count(lit(1)).as("lc"))
    val dsum = deg.join(lab, Seq("id"))
      .groupBy(col("lbl").as("c")).agg(sum("d").as("dc"))
    dsum.join(intra, Seq("c"), "left")
      .crossJoin(broadcast(mRow))
      .select(col("c"),
        (coalesce(col("lc"), lit(0L)).cast("double") / col("m") -
          (col("dc").cast("double") / (lit(2.0) * col("m"))) *
            (col("dc").cast("double") / (lit(2.0) * col("m")))).as("term"),
        col("m"))
      .agg(count(lit(1)).as("n_communities"),
        max(col("m")).as("m_edges"),
        round(sum("term"), 6).as("modularity"))
  }

  /** Neighbor-set Jaccard link prediction: for non-adjacent pairs,
    * `score = i′ / (deg(x) + deg(y) − i′)` where `i′` counts common
    * neighbors whose degree is ≤ `maxDeg` — [[adamicAdar]]'s sibling
    * scorer with the SAME hub-pivot guard (a hub is every node's
    * common neighbor: it adds deg² wedge fan-out and near-zero signal,
    * so large-scale link predictors drop it; the oracle replays the
    * identical rule, making the guarded score exact, not approximate-
    * vs-gate). Degrees in the denominator are FULL degrees.
    *
    * Scale shape identical to [[adamicAdar]]: keyed wedge self-join
    * bounded by maxDeg², anti-join against existing edges, one keyed
    * count, heap-based top-k. Score is one exact-int division →
    * round(6) BEFORE the ranking.
    *
    * Degrees are attached to the ADJACENCY rows (one O(edges) keyed
    * join) and ride through the wedge join, so the O(candidate pairs)
    * stream is never joined again after its aggregation — the naive
    * alternative (join deg onto the aggregated pairs) is broadcast-
    * shaped at toy scale but flips to sort-merge once deg outgrows
    * the threshold, double-shuffling the pair stream exactly when it
    * is largest (measured: 22× shuffle records for 10× data; with
    * degrees riding the wedges, every shuffle in the plan is linear
    * in edges + capped wedges at any scale). */
  def jaccardLinks(
      edges: DataFrame,
      maxDeg: Int = 64,
      topK: Int = 50,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // same materialization rationale as [[adamicAdar]] (r18): und
    // feeds adj twice + the anti-join, padj feeds both wedge sides
    val und = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    val adj = und.select(col("u").as("z"), col("v").as("x"))
      .union(und.select(col("v").as("z"), col("u").as("x")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("d"))
    val pivots = deg.filter(col("d") >= 2 && col("d") <= maxDeg).select("z")
    // each endpoint's FULL degree rides on its adjacency row from here.
    // Deliberately UNHINTED: either strategy is O(edges) — broadcast
    // while deg (one row per node) fits the threshold, sort-merge when
    // it outgrows it — and neither touches the O(pairs) stream, which
    // is what the pinned hints below protect.
    val dadj = adj.join(
      deg.select(col("z").as("x"), col("d").as("dx")), "x")
    val padj = dadj.join(pivots.hint("shuffle_merge"), "z").localCheckpoint()
    val wedges = padj.as("a")
      .join(padj.as("b").hint("shuffle_merge"),
        col("a.z") === col("b.z") && col("a.x") < col("b.x"))
      .select(col("a.x").as("x"), col("a.dx").as("dx"),
        col("b.x").as("y"), col("b.dx").as("dy"))
    val inter = wedges.join(
        und.select(col("u").as("x"), col("v").as("y")).hint("shuffle_merge"),
        Seq("x", "y"), "left_anti")
      .groupBy("x", "y").agg(count(lit(1)).as("i"),
        // dx/dy are functions of the group key — max() is exact
        max(col("dx")).as("dx"), max(col("dy")).as("dy"))
    inter
      .select(col("x"), col("y"),
        round(col("i").cast("double") /
          (col("dx") + col("dy") - col("i")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("x"), col("y"))
      .limit(topK)
  }

  /** Truncated harmonic closeness centrality from a seed set: for each
    * seed, `Σ_{v reachable, 0 < dist(v) ≤ rounds} 1/dist(v)` — the
    * bounded-radius centrality probe (harmonic form handles
    * disconnected graphs; truncation makes the fixed unroll exact, the
    * [[shortestHops]] contract). The frontier is keyed on (seed, id),
    * so all `|seeds|` BFS waves share each round's single keyed
    * join+agg — one traversal, not one per seed. The 1/dist sum is
    * order-dependent in the last ulp → round(6), everything before it
    * exact ints. */
  def harmonicCloseness(
      edges: DataFrame,
      seeds: Seq[Long],
      rounds: Int = 4,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(seeds.nonEmpty, "harmonicCloseness needs at least one seed")
    val und0 = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = und0.select(col("a").as("src"), col("b").as("dst"))
      .union(und0.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint()
    var dist = und.select(col("src").as("id")).distinct()
      .filter(col("id").isInCollection(seeds))
      .select(col("id").as("seed"), col("id"), lit(0L).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = und
        .join(dist.select(col("id").as("src"), col("seed"), col("dist")), "src")
        .select(col("seed"), col("dst").as("id"), (col("dist") + 1L).as("dist"))
      val next = dist.union(relaxed)
        .groupBy("seed", "id").agg(min("dist").as("dist"))
        .localCheckpoint()
      graft.core.Lineage.release(dist)
      dist = next
    }
    val out = dist.filter(col("dist") > 0L)
      .groupBy("seed").agg(count(lit(1)).as("n_reached"),
        round(sum(lit(1.0) / col("dist").cast("double")), 6).as("harmonic"))
    graft.core.Lineage.release(und)
    out
  }

  /** Bounded-round weighted single-source shortest paths (Bellman–
    * Ford min-plus relaxation from a seed set): `dist_{t+1}(v) =
    * min(dist_t(v), min_{u→v} dist_t(u) + w(u,v))` for `rounds`
    * rounds — exact for all paths of ≤ `rounds` hops, the same
    * fixed-unroll contract as [[shortestHops]] (distributed SSSP's
    * standard form: no priority queue, one keyed join+agg per round).
    * Integer weights keep every distance exact. */
  def weightedSssp(
      edges: DataFrame,
      seeds: Seq[Long],
      rounds: Int = 4,
      srcCol: String = "src",
      dstCol: String = "dst",
      weightCol: String = "w"
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(seeds.nonEmpty, "weightedSssp needs at least one seed")
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min("w").as("w"))
      .localCheckpoint()
    var dist = e0.select(col("src").as("id")).distinct()
      .filter(col("id").isInCollection(seeds))
      .withColumn("dist", lit(0L)).localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = e0
        .join(dist.select(col("id").as("src"), col("dist")), "src")
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      val next = dist.union(relaxed)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint()
      graft.core.Lineage.release(dist)
      dist = next
    }
    graft.core.Lineage.release(e0)
    dist
  }

  /** HITS hubs & authorities (Kleinberg 1999): `a_{t+1}(v) =
    * Σ_{u→v} h_t(u)`, `h_{t+1}(u) = Σ_{u→v} a_{t+1}(v)`, each side
    * max-normalized after its update (max is order-independent, unlike
    * the L2 norm's sum — and the subsequent round(6) collapses the
    * shuffle-order ulp band of the per-node sums, so fixed-iteration
    * runs replay exactly in an unrolled relational oracle). Per round:
    * two keyed join+agg passes (the pageRank shape) + two single-row
    * max broadcasts; scores locally checkpointed for O(1) lineage.
    * Dangling/source-less nodes score 0 on the respective side. */
  def hits(
      edges: DataFrame,
      iterations: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().localCheckpoint()
    val nodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct().localCheckpoint()
    var h = nodes.withColumn("h", lit(1.0))
    var a = nodes.withColumn("a", lit(0.0))
    for (_ <- 1 to iterations) {
      val aRaw = e0.join(h, e0("src") === h("id"))
        .groupBy("dst").agg(sum("h").as("ar"))
      val maxA = aRaw.agg(max("ar").as("ma"))
      val aNext = nodes.join(aRaw, nodes("id") === aRaw("dst"), "left")
        .crossJoin(broadcast(maxA))
        .select(col("id"),
          round(coalesce(col("ar"), lit(0.0)) / col("ma"), 6).as("a"))
        .localCheckpoint()
      val hRaw = e0.join(aNext, e0("dst") === aNext("id"))
        .groupBy("src").agg(sum("a").as("hr"))
      val maxH = hRaw.agg(max("hr").as("mh"))
      val hNext = nodes.join(hRaw, nodes("id") === hRaw("src"), "left")
        .crossJoin(broadcast(maxH))
        .select(col("id"),
          round(coalesce(col("hr"), lit(0.0)) / col("mh"), 6).as("h"))
        .localCheckpoint()
      graft.core.Lineage.release(a, h)
      a = aNext; h = hNext
    }
    val out = a.join(h, "id")
    graft.core.Lineage.release(e0, nodes)
    out
  }
}
