package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed TRIANGLE COUNTING by degree-ordered wedge closure — the
  * third graph operator beside connected components (q54) and PageRank
  * (q88). The naive formulation (three-way self-join of the edge list)
  * generates Σ deg(v)² wedges — quadratic in the hottest vertex, the
  * classic power-law blowup. The published fix (Cohen's MapReduce
  * orientation; Schank's forward algorithm): make each undirected edge
  * DIRECTED from the endpoint that is smaller in the total order
  * (degree, id), then close wedges only between OUT-neighbors. Every
  * out-degree is then bounded by O(√|E|) whatever the degree skew — a
  * celebrity vertex with 10⁸ followers contributes wedges only through
  * its (few) higher-degree peers, so wedge count drops from Σ deg² to
  * Σ outdeg² ≤ |E|^1.5, the arboricity bound.
  *
  * Relationally: two shuffles to degrees, one self-join on the wedge
  * apex, one equi-join to close — all standard hash joins on key
  * columns, no driver state, no iteration.
  */
object Triangles {

  /** Per-node triangle participation: one row per vertex that sits in
    * at least one triangle — (node, n_triangles). Input edges may be
    * directed/duplicated/self-looped; they canonicalize first.
    */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    // orient a -> b by the total order (deg, id); carry b's order key
    // so the wedge join can order the two out-neighbors without a
    // second degree lookup
    def ord(d: String, n: String) =
      struct(col(d).as("d"), col(n).as("i"))
    val lt = ord("du", "u") < ord("dv", "v")
    val oriented = withDeg.select(
        when(lt, col("u")).otherwise(col("v")).as("a"),
        when(lt, col("v")).otherwise(col("u")).as("b"),
        when(lt, ord("dv", "v")).otherwise(ord("du", "u")).as("ord_b"))
      .localCheckpoint() // reused three times below — plan once
    // wedges between out-neighbors (b below c in the order), closed by
    // the oriented edge b -> c (same order ⟹ that is its orientation)
    val x = oriented.select(col("a"), col("b").as("b1"), col("ord_b").as("o1"))
    val y = oriented.select(col("a"), col("b").as("b2"), col("ord_b").as("o2"))
    val tri = x.join(y, Seq("a")).where(col("o1") < col("o2"))
      .join(oriented.select(col("a").as("b1"), col("b").as("b2")),
        Seq("b1", "b2"))
      .select(col("a"), col("b1"), col("b2"))
    tri.select(explode(array(col("a"), col("b1"), col("b2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("long").as("n_triangles"))
  }
}
