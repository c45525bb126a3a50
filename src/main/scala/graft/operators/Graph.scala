package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge lists — the family that ranks
  * and clusters a similarity graph once dedup has built it (connected
  * components lives in [[Dedup.connectedComponents]]; this hosts the
  * iterative value-propagation operators).
  *
  * Everything is edge-list MapReduce: an iteration is one equi-join of
  * the edge list against the current node values plus one aggregation
  * by destination — the Pregel step expressed as DataFrame shuffles,
  * the same shape GraphX/Giraph run at web scale. No adjacency matrix,
  * no driver-side graph state; `localCheckpoint` caps lineage per
  * round exactly like the CC loop.
  */
object Graph {

  /** PageRank in FIXED-POINT integer arithmetic: node values are
    * BIGINT micro-units (initial 1,000,000 per node), an iteration
    * sends `rank div degree` along every (undirected) edge and damps
    * with integer `(85·Σ) div 100 + 150,000`. Two properties make this
    * the form a cross-engine pipeline wants:
    *
    *   - EXACT determinism: integer sums are order-independent, so any
    *     engine (the DuckDB oracle unrolls the same iterations) lands
    *     on the same bits — no float-summation drift, no rounding
    *     policy to negotiate. Remainders of the integer divisions are
    *     deliberately dropped (total mass decays slightly); rank is an
    *     ORDERING signal, not a probability.
    *   - Scale: per iteration one broadcast-or-shuffle join of edges
    *     against ranks + one sum-by-destination — linear in |E|, the
    *     standard distributed PageRank cost. Dangling/isolated nodes
    *     simply keep receiving the base term.
    *
    * Edges are treated as undirected (both directions carry rank);
    * self-loops and duplicate edges are dropped first.
    *
    * Output: (node long, degree long, pr long) for every node that
    * appears in `nodes`, after `iters` rounds.
    */
  def pageRankFixedPoint(edges: DataFrame, aCol: String, bCol: String,
                         nodes: DataFrame, nodeCol: String,
                         iters: Int): DataFrame = {
    val sym = edges
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
    val undirected = sym.unionAll(sym.select(col("v").as("u"), col("u").as("v")))
      .transform(graft.util.Checkpoints.pin)
    val deg = undirected.groupBy("u").agg(count(lit(1)).as("degree"))
    val all = nodes.select(col(nodeCol).cast("long").as("u")).distinct()
      .join(deg, Seq("u"), "left_outer")
      .select(col("u"), coalesce(col("degree"), lit(0L)).as("degree"))
      .transform(graft.util.Checkpoints.pin)

    var ranks = all.select(col("u"), lit(1000000L).as("pr"))
    (1 to iters).foreach { _ =>
      val contrib = undirected
        .join(ranks.join(deg, Seq("u")), Seq("u"))
        .select(col("v").as("u"), expr("pr div degree").as("__c"))
        .groupBy("u").agg(sum("__c").as("__s"))
      ranks = all.select(col("u"))
        .join(contrib, Seq("u"), "left_outer")
        .select(col("u"),
          (lit(150000L) + expr("85 * coalesce(__s, 0L) div 100")).as("pr"))
        .transform(graft.util.Checkpoints.pin)
    }
    all.join(ranks, Seq("u"))
      .select(col("u").as("node"), col("degree"), col("pr"))
  }
}
