package graft.ext

import org.apache.spark.sql.DataFrame
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

  /** Fixed-iteration PageRank: `rank_{t+1}(v) = (1-d) + d * Σ_{u→v}
    * rank_t(u) / outdeg(u)` with `rank_0 = 1` over every node that
    * appears as a source or destination. Dangling nodes (no
    * out-edges) contribute nothing — the simplified formulation whose
    * per-iteration result is a pure function of the edge set, so an
    * external oracle can replay it exactly.
    *
    * Scale shape: the edge set is deduplicated, pre-joined with
    * out-degrees ONCE and checkpointed — each of the `iterations`
    * rounds is then one join (ranks onto edge sources) plus one keyed
    * aggregation (contributions by destination): two hash shuffles of
    * (id, double) pairs, independent of edge payload width. Ranks are
    * locally checkpointed per round so the lineage (and thus the plan)
    * stays O(1) instead of O(iterations). No broadcast of anything
    * node- or edge-sized; no driver collect.
    *
    * Determinism: per-destination contribution sums are double
    * additions in shuffle order — round the FINAL ranks (the caller's
    * job) when comparing across engines; intermediate ranks are left
    * unrounded, matching what an unrolled relational replay computes.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 5,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().localCheckpoint()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — the loop-invariant message topology
    val withDeg = e0.join(deg, "src").localCheckpoint()
    val nodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct().localCheckpoint()
    var ranks = nodes.withColumn("r", lit(1.0))
    for (_ <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), (col("r") / col("outdeg")).as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      val next = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("r"))
        .localCheckpoint()
      // round t's ranks have no consumer once round t+1 materializes
      // (release is a no-op on the round-0 ranks, a derived frame);
      // storage across the loop stays O(1) instead of O(iterations)
      graft.core.Lineage.release(ranks)
      ranks = next
    }
    // e0 fed withDeg/nodes at build time; the result references neither
    graft.core.Lineage.release(e0, withDeg, nodes)
    ranks
  }
}
