package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental MATERIALIZED-AGGREGATE maintenance over the warehouse
  * change feed — the consumer-side contract [[Warehouse.readChangeFeed]]
  * promises: a (count, sum)-shaped aggregate is maintained EXACTLY by
  * folding feed rows weighted by `_change_delta` (+1 added / -1
  * removed), with no rescan of table history. DELETE retracts, UPDATE
  * retracts the pre-image and asserts the post-image, COMPACT's
  * re-emitted rows cancel pairwise — the fold is oblivious to WHICH
  * DML produced the feed.
  *
  * Count and sum are the self-maintainable aggregates (avg = sum/count
  * derives); min/max are NOT maintainable from a feed alone (a
  * retracted extremum needs the remaining rows) — that restriction is
  * fundamental to incremental view maintenance, not an implementation
  * limit here.
  *
  * Scale shape: the delta fold aggregates the FEED (bounded by the
  * touched partitions since the snapshot), shuffled once on the group
  * key; merging with prior state is a second group-key shuffle of
  * |groups| rows. The maintained state never rescans the table — at
  * 100 TB that is the difference between a view refresh costing
  * O(changed partitions) and O(table).
  */
object MaterializedView {

  /** Materialize the aggregate state (one row per group:
    * `n_rows`, `total`) from a table snapshot — the view's initial
    * refresh, and the re-derivation [[foldAgg]] must always match.
    */
  def initAgg(snapshot: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col(valueCol)).as("total"))

  /** Advance materialized `state` by a delta-weighted change feed
    * (the [[Warehouse.readChangeFeed]] shape: table columns plus
    * `_change_delta` ∈ {+1, -1}). Groups whose maintained count
    * reaches zero leave the state — matching what a recompute over the
    * post-change snapshot would produce.
    */
  def foldAgg(state: DataFrame, feed: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val delta = feed.groupBy(groupCols.map(col): _*)
      .agg(sum(col("_change_delta")).cast("long").as("n_rows"),
        sum(col(valueCol) * col("_change_delta")).as("total"))
    state.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n_rows")).cast("long").as("n_rows"),
        sum(col("total")).as("total"))
      .where(col("n_rows") > 0)
  }
}
