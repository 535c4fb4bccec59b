package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named DataFrame query over a
  * scale-factor directory, plus (when SQL-expressible) the equivalent
  * ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Conventions that make the hash-compare robust:
  *   - every query ends in a total ORDER BY (both sides);
  *   - float aggregates are round(x, 2)-ed on both sides (accumulation
  *     order differs between engines; 2 dp leaves ~7 orders of magnitude
  *     of headroom over double accumulation error at these scales);
  *   - integer outputs are cast to BIGINT on both sides (DuckDB widens
  *     SUM(int) to HUGEINT, Spark to long);
  *   - event-time outputs are emitted as epoch milliseconds (BIGINT):
  *     events.parquet carries nanosecond timestamps, which Spark reads
  *     floor-truncated to micros and DuckDB casts the same way.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def all: Seq[Q]
}
