package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank by power iteration — the second iterative
  * graph operator next to [[graft.ext.NearDup.clusters]] (connected
  * components), sharing its execution shape: per round one
  * weighted-contribution join + one destination aggregate, driver
  * logic only for the loop counter.
  *
  * Scale shape: edges shuffle on `src` once per iteration joined to
  * the (|nodes|)-sized rank table; contributions aggregate on `dst`
  * (map-side combined). State is one (node, rank) row per node —
  * never materialized on the driver. Lineage is cut with
  * `localCheckpoint` every few rounds (the iterative-plan trap: an
  * uncut 20-round plan tree re-executes the whole prefix under AQE
  * re-planning; same fix as NearDup.clusters).
  *
  * Dangling nodes (no out-edges) leak their mass — the simplified
  * textbook formulation; ranks then sum to < 1, which is fine for
  * RANKING (the use case) and keeps the per-round plan to one join.
  */
object PageRank {

  /** @param edges (src, dst, w) weighted directed edges, w > 0
    * @param nodes one `node` column — the vertex universe (isolated
    *   vertices keep the teleport rank)
    * @param iters fixed power-iteration count
    * @return (node, rank) after `iters` rounds from a uniform start
    */
  def run(edges: DataFrame, nodes: DataFrame, iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val total = nodes.agg(count(lit(1)).cast("double").as("nn"))
    val outW = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    // normalized transition weights, reused every round
    val trans = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("wout")).as("p"))
    var ranks = nodes.crossJoin(broadcast(total))
      .select(col("node"), (lit(1.0) / col("nn")).as("pr"))
    for (i <- 1 to iters) {
      val contribs = trans.join(ranks, col("src") === col("node"))
        .groupBy("dst").agg(sum(col("p") * col("pr")).as("cin"))
      ranks = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .crossJoin(broadcast(total))
        .select(col("node"),
          (lit(1.0 - damping) / col("nn") +
            lit(damping) * coalesce(col("cin"), lit(0.0))).as("pr"))
      if (i % checkpointEvery == 0) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("pr").as("rank"))
  }
}
