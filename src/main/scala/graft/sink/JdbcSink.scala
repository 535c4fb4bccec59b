package graft.sink

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink surface (SURVEY.md §2.1 S4-S6, §2.2 K2-K4).
  *
  * The reference's warehouse is PostgreSQL over SQLAlchemy; the engine
  * exposes the same operations through Spark's JDBC connector, where
  * Catalyst pushes projection and predicates into the remote scan
  * (`V2ScanRelationPushDown`) — the two hand-written optimizations in
  * the reference (`/root/reference/script.py:85,141,159` SELECT-only-keys
  * and the 3-day WHERE) happen automatically.
  *
  * Batched writes: `batchsize` maps 1:1 to the reference's
  * `chunksize=1000` (`script.py:171`).
  */
object JdbcSink {

  def props(extra: (String, String)*): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** K2-K4 — append with JDBC batch size (`script.py:92,148,171`). */
  def append(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, connProps: Properties = props()): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, connProps)

  /** S4-S6 — scan; compose `.select`/`.where` on the result and Catalyst
    * pushes them down to the database.
    */
  def read(spark: SparkSession, url: String, table: String,
      connProps: Properties = props()): DataFrame =
    spark.read.jdbc(url, table, connProps)
}
