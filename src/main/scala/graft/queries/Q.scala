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

/** Per-JVM cache for deterministic on-disk fixtures (synthesized landing
  * files): a fixture is a pure function of its key (query + sf dir), so
  * bench's warm-up and timed passes measure the operator under test, not
  * repeated fixture writes. NEVER cache state the query must mutate
  * (e.g. a warehouse a run-twice fixpoint writes into).
  */
object Fixtures {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  def cached[T <: AnyRef](key: String)(build: => T): T =
    cache.computeIfAbsent(key, _ => build).asInstanceOf[T]
}
