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
  * Dangling nodes (no out-edges) LEAK their mass in the default mode —
  * the simplified textbook formulation; ranks then sum to < 1, which is
  * fine for RANKING (the use case) and keeps the per-round plan to one
  * join. `redistributeDangling = true` is the exact-PageRank mode: one
  * extra SCALAR aggregate per round folds the leaked mass back as a
  * uniform teleport share (broadcast — never a per-node join), so ranks
  * sum to 1 every round.
  */
object PageRank {

  /** @param edges (src, dst, w) weighted directed edges, w > 0
    * @param nodes one `node` column — the vertex universe (isolated
    *   vertices keep the teleport rank)
    * @param iters fixed power-iteration count
    * @param redistributeDangling fold dangling-node mass back uniformly
    *   each round (exact PageRank); default keeps the cheaper leaky
    *   ranking mode and the r4 plan unchanged
    * @return (node, rank) after `iters` rounds from a uniform start
    */
  def run(edges: DataFrame, nodes: DataFrame, iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 8,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val total = nodes.agg(count(lit(1)).cast("double").as("nn"))
    val outW = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    // Normalized transition weights, reused EVERY round: materialize
    // once. The caller's edge frame is often an expensive derivation
    // (q103 builds it from a 4-table join) — without the cut, every
    // round's replay re-runs it.
    val trans = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("wout")).as("p"))
      .localCheckpoint()
    // the static dangling set: vertices with no out-edge (materialized
    // only when the redistribute mode will actually read it — a
    // localCheckpoint is eager)
    val dangling0 = nodes.join(
      outW.select(col("src").as("node")), Seq("node"), "left_anti")
    val dangling =
      if (redistributeDangling) dangling0.localCheckpoint() else dangling0
    var ranks = nodes.crossJoin(broadcast(total))
      .select(col("node"), (lit(1.0) / col("nn")).as("pr"))
    for (i <- 1 to iters) {
      val contribs = trans.join(ranks, col("src") === col("node"))
        .groupBy("dst").agg(sum(col("p") * col("pr")).as("cin"))
      val base = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .crossJoin(broadcast(total))
      ranks =
        if (!redistributeDangling)
          base.select(col("node"),
            (lit(1.0 - damping) / col("nn") +
              lit(damping) * coalesce(col("cin"), lit(0.0))).as("pr"))
        else {
          // leaked mass this round: one scalar reduce over the dangling
          // subset of the rank table, broadcast into the update
          val dm = ranks.join(dangling, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
          base.crossJoin(broadcast(dm))
            .select(col("node"),
              (lit(1.0 - damping) / col("nn") +
                lit(damping) * (coalesce(col("cin"), lit(0.0)) +
                  col("dm") / col("nn"))).as("pr"))
        }
      // Redistribute mode reads each round's ranks TWICE (contribution
      // join + dangling-mass scalar): uncut, the lineage would DOUBLE
      // per round — 2^iters replays of everything upstream. Cut every
      // round there; the leaky mode's single-consumer lineage grows
      // linearly and keeps the cheaper cadence.
      if (redistributeDangling || i % checkpointEvery == 0)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("pr").as("rank"))
  }
}
