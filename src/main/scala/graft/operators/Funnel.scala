package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel completion — the product-analytics staple: of the
  * users who did step 1, how many later did step 2, then step 3, ...
  * Each step must occur STRICTLY after the user's completion time of
  * the previous step (first-touch semantics: the earliest qualifying
  * event advances the funnel).
  *
  * Scale shape: one filtered aggregate per step keyed by user — every
  * join is user-keyed against the (shrinking) survivor set of the
  * previous step, so work decreases monotonically down the funnel and
  * nothing is ever windowed or collected. Step count is the plan
  * depth, not a data dimension.
  */
object Funnel {

  /** @param events one row per event
    * @param steps event-type sequence defining the funnel
    * @return (step, event_type, n_users): users completing each prefix
    */
  def completion(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    val perStep = steps.tail.scanLeft(first) { (prev, st) =>
      events.where(col(typeCol) === st)
        .join(prev.select(col(userCol), col("_t")), userCol)
        .where(col(tsCol) > col("_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    }
    perStep.zip(steps).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("event_type"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }
}
