package graft.graphquery

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond pattern matching ([[Bgp]]) and the
  * dedup connected-components fixpoint (`graft.llm.Dedup`): iterative
  * rank propagation in the Pregel shape — per-iteration keyed shuffles,
  * never an adjacency matrix.
  */
object Graph {

  /** PageRank, integer-exact: ranks held as parts-per-billion BIGINTs so
    * every engine computes bit-identical results regardless of partition
    * count or reduce order (float PageRank sums in nondeterministic order
    * and drifts in the last bits — un-oracle-able). Per iteration each
    * node sends `rank div outDegree` (integer floor division) along each
    * out-edge and every node's next rank is
    * `(1-d)·10⁹ + (d · Σ incoming) div 1` computed as
    * `(100-dampPct)·10⁷ + (dampPct · Σ) div 100` — all BIGINT, all
    * order-independent. Dangling mass (nodes with no out-edges) is
    * dropped, not redistributed, matching the classic formulation — the
    * oracle mirrors exactly this.
    *
    * Scale shape: `outDeg` is one groupBy of the edge list; each
    * iteration is one `src`-keyed join (edges ⋈ ranks — both sides
    * key-partitioned, AQE can co-locate the repeat) and one `dst`-keyed
    * aggregation; the node table right-joins the aggregate so sinks with
    * no in-edges keep the base rank. Lineage is cut per iteration with
    * `localCheckpoint` — 5 iterations on a 1000-executor cluster is 5
    * cheap keyed shuffles of |V| rows, never |V|² anything. Overflow
    * bound: `dampPct · Σ incoming` stays under 2⁶³ while
    * |V| · 10⁹ · 100 < 9.2·10¹⁸, i.e. up to ~9·10⁷ nodes per connected
    * in-neighborhood at full precision — beyond that, drop the ppb unit
    * to ppm (the precision the reports keep anyway).
    *
    * Returns (node, rank_ppb): rank 1.0 (the uniform start) = 10⁹; ranks
    * sum to ≤ |V|·10⁹ with the dangling leak.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5, dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .distinct()
    val nodes = e.select(col("_src").as("node"))
      .union(e.select(col("_dst").as("node"))).distinct()
      .localCheckpoint()
    val outDeg = e.groupBy(col("_src")).agg(count(lit(1)).as("_deg"))
    // Degree is joined once, up front, so the per-iteration join carries
    // (src, dst, deg) — one shuffle fewer per round.
    val edgesDeg = e.join(outDeg, "_src").localCheckpoint()
    val base = lit((100L - dampPct) * 10000000L)
    var ranks = nodes.withColumn("rank_ppb", lit(1000000000L))
    for (_ <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "_src"), "_src")
        // `div`, not `/`: BIGINT floor division on both engines — `/`
        // would round-trip through DOUBLE.
        .select(col("_dst"), expr("rank_ppb div _deg").as("_c"))
        .groupBy(col("_dst")).agg(sum(col("_c")).as("_in"))
      ranks = nodes
        .join(contribs.withColumnRenamed("_dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (base + expr(s"($dampPct * coalesce(_in, 0L)) div 100"))
            .cast("long").as("rank_ppb"))
        .localCheckpoint()
    }
    ranks
  }
}
