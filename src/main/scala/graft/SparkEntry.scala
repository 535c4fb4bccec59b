package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the themed packs; each pack entry carries
  * its own DuckDB oracle where SQL-expressible (Q.scala documents the
  * determinism conventions that make the hash compare stable).
  */
object SparkEntry {

  /** All query packs, in presentation order. */
  def packs: Seq[QueryPack] = Seq(CoreQueries, TleQueries, LlmQueries)

  private lazy val allQs: Seq[Q] = packs.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the SURVEY §7 flagship — newest orbital state per satellite through
    * the full TLE synth→parse→window path, joined to the broadcast
    * dim_satellites side for sat_name (q47).
    */
  def entry(spark: SparkSession): DataFrame =
    allQs.find(_.name == "q47_latest_state_dim_join").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
