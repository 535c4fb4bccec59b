package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** Scaling-probe main (not a test): the 800k-entry PARTITIONED
  * manifest, measuring the round-11 lazy partition-pruned planning
  * path against the eager cached-snapshot path. Run with `java -cp`
  * over classes + test-classes + the Spark jars (JDK17 --add-opens
  * apply). Results land in SCALING_r11.md.
  */
object Probe800k {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-probe800k", nCpus = 8)
    val dir = Files.createTempDirectory("graft-p800k-").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    val wh = new Warehouse(spark, dir, checkpointInterval = 1,
      specs = Map("big" -> Warehouse.TableSpec(schema,
        partitionBy = Seq("s"), statColumns = Seq("k"))))
    wh.columnarThreshold = 1000L
    wh.bootstrap()
    val n = 800000
    val nparts = 400
    val sb = new StringBuilder("graft-manifest 1")
    var i = 0
    while (i < n) {
      sb.append(s"\ns=g${i % nparts}/part-$i.parquet\t1048576\tk=$i:${i + 9}\t100\t\t0")
      i += 1
    }
    Files.write(Paths.get(dir, "big", "_manifests", "v000000000002.mf"),
      sb.result().getBytes(StandardCharsets.UTF_8))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"TIME $label ${(System.nanoTime - t0) / 1e9}%.3f s"); r
    }
    time("materializeColumnar (one-time)") { wh.materializeColumnar("big") }
    Warehouse.invalidateCached(s"$dir#big#")

    // COLD one-partition read: Catalyst pushes s='g7' into the lazy
    // index; .rdd.partitions forces listFiles + file-partition
    // planning end-to-end without running tasks
    val cold = time("COLD one-partition plan (lazy distributed prune)") {
      wh.read("big").where(col("s") === "g7").rdd.partitions.length
    }
    println(s"cold planned rdd partitions: $cold")
    println("driver folded? " + Warehouse.snapshotCacheGet(
      wh.currentCacheKey("big", 2L)).isDefined)
    time("WARM one-partition plan (agg memoized)") {
      wh.read("big").where(col("s") === "g7").rdd.partitions.length
    }
    val df = wh.read("big")
    val idx = df.queryExecution.analyzed.collectFirst {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          h: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) => h.location
    }.get
    val attr = df.queryExecution.analyzed.output.find(_.name == "s").get
    val parts = time("listFiles(s=g7) direct") {
      idx.listFiles(Seq(
        org.apache.spark.sql.catalyst.expressions.EqualTo(attr,
          org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString("g7"),
            StringType))), Nil)
    }
    println(s"survivor files: ${parts.map(_.files.length).sum} of $n")
    println("driver folded after probes? " + Warehouse.snapshotCacheGet(
      wh.currentCacheKey("big", 2L)).isDefined)

    // EAGER comparison: full text fold (the pre-round shape), then the
    // same filtered plan over the cached snapshot (r10's 3.0s residual)
    time("full text fold (warms snapshot cache)") {
      wh.read("big").inputFiles.length
    }
    val eager = time("one-partition plan over CACHED snapshot (eager)") {
      wh.read("big").where(col("s") === "g7").rdd.partitions.length
    }
    println(s"eager planned rdd partitions: $eager")
    spark.stop()
  }
}
