package graft.sink

import org.apache.spark.sql.DataFrame

/** Bucketed managed tables — the co-located-join storage layout
  * (SURVEY.md §4 / the scale design notes): writing fact and dim
  * bucketed by the same key into the same bucket count lets every
  * subsequent equi-join on that key skip BOTH shuffle exchanges (the
  * scan is already hash-partitioned by bucket), which at warehouse scale
  * is the difference between a join that moves 100 TB and one that
  * moves nothing.
  *
  * Parquet-backed managed tables in the session catalog; Spark's bucket
  * layout (hash(key) mod n file groups, optional in-bucket sort) is
  * what `SortMergeJoin` recognizes to elide exchanges.
  */
object BucketedSink {

  def save(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }
}
