package graft

import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.pipeline.Warehouse

/** Second-JVM half of the cross-process coherence spec: a REAL foreign
  * process (own SparkSession, own JVM-wide caches) running genuine
  * Warehouse code against a directory the parent test JVM has already
  * cached — unlike the raw-filesystem swaps elsewhere in
  * SnapshotLifecycleSpec, every manifest/commit/lifetime rule executes
  * in both processes. Launched by the spec via `java -cp` with the
  * test JVM's own classpath.
  *
  * args: <warehouseDir> <op> [base], op ∈ {append, dropRecreate,
  * appendRace}. Prints CHILD_OK on success (the spec's completion
  * marker).
  */
object CoherenceChild {
  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))

  def main(args: Array[String]): Unit = {
    val Array(dir, op) = args.take(2)
    val spark = GraftSession.local("graft-coherence-child", nCpus = 2)
    import spark.implicits._
    val spec = Map("t" -> Warehouse.TableSpec(schema,
      statColumns = Seq("k")))
    op match {
      case "append" =>
        new Warehouse(spark, dir, specs = spec)
          .append("t", Seq((100L, "child")).toDF("k", "s"))
      case "dropRecreate" =>
        new Warehouse(spark, dir, specs = spec).dropTable("t")
        val wh2 = new Warehouse(spark, dir, specs = spec)
        wh2.bootstrap()
        wh2.append("t", Seq((7L, "recreated"), (8L, "recreated"))
          .toDF("k", "s"))
      case "appendRace" =>
        // the concurrent-writer half of the race spec: a burst of
        // single-row append COMMITS while a sibling JVM does the same
        // against the same table — every manifest rename this process
        // loses must fence, re-resolve the head and retry, losing
        // nothing and never double-committing a batch
        val base = args(2).toLong
        val wh = new Warehouse(spark, dir, specs = spec)
        (0L until 12L).foreach { i =>
          wh.append("t", Seq((base + i, s"child$base")).toDF("k", "s"))
        }
      case other =>
        throw new IllegalArgumentException(s"unknown op $other")
    }
    println("CHILD_OK")
    spark.stop()
  }
}
