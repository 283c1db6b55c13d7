package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality (SURVEY §2 C). The LLM-data use is
  * domain/source authority: crawl curation weights documents by the
  * link-graph standing of their origin (the classic "quality from
  * the web graph" signal — PageRank), which no per-document feature
  * can compute. Alongside [[Dedup.connectedComponents]] this gives
  * the engine both ends of the iterative-graph spectrum: reachability
  * (CC) and stationary-mass (PR).
  */
object Graph {

  /** PageRank over an undirected edge list, in EXACT integer
    * arithmetic: ranks live in micro fixed-point longs, each node's
    * per-edge contribution is `rank div degree` (integer division —
    * truncation is part of the operator's definition, identical in
    * any engine for the non-negative ranks here), and the damping
    * update is `150000 + (85 * Σcontrib) div 100` (d = 0.85). Every
    * step is summation-order-free integer math, so ranks are
    * bit-identical across engines, partitionings, and retries — the
    * property that makes the whole training loop oracle-checkable
    * (s4's scaled-long centroid rule applied to graph iteration).
    *
    * Scale shape per iteration: one fact-dim equi-join (edges ×
    * ranks on the src key) + one partial agg on the dst key — narrow
    * (node, long) rows only; the rank table is localCheckpointed
    * each round so lineage doesn't stack across iterations (the
    * d9/d16 rule). Degrees are computed once. Iterations are a
    * caller-fixed constant — at 100 TB each round is two shuffles of
    * node-cardinality rows, independent of edge multiplicity past
    * the first distinct. */
  def pageRank(edges: DataFrame, src: String, dst: String,
      iterations: Int): DataFrame = {
    val und = edges.select(col(src).as("u"), col(dst).as("v"))
      .unionByName(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
      .localCheckpoint(true)
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    // degrees attached to the edge list ONCE, outside the loop: the
    // old form re-joined edges⋈deg inside every iteration, paying an
    // edge-sized join per round for a table that never changes. The
    // checkpointed (u, v, deg) table keeps its u-partitioning, so
    // each round's contribution join re-shuffles only the node-sized
    // rank table (or broadcasts it), never the edges.
    val undDeg = und.join(deg, Seq("u")).localCheckpoint(true)
    var ranks = deg.select(col("u").as("node"), lit(1000000L).as("r"))
      .localCheckpoint(true)
    (1 to iterations).foreach { _ =>
      val contrib = undDeg.join(ranks, col("u") === col("node"))
        .select(col("v"), expr("r div deg").as("c"))
      val sums = contrib.groupBy(col("v")).agg(sum(col("c")).as("s"))
      ranks = deg.select(col("u").as("node"))
        .join(sums, col("node") === col("v"), "left_outer")
        .select(col("node"),
          (lit(150000L) + expr("(coalesce(s, 0L) * 85) div 100")).as("r"))
        .localCheckpoint(true)
    }
    ranks
  }
}
