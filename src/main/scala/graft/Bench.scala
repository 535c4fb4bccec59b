package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Force FULL materialization of the final plan — including sorts and
    * columns a `count()` would let Catalyst prune — by writing to the
    * built-in `noop` datasource (consumes every row of every column,
    * writes nothing). This is what makes window/sort queries measurable.
    */
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      cpus).getOrCreate()
    GraftExtensions.register(spark) // in case getOrCreate hit a cached session
    spark.sparkContext.setLogLevel("WARN")
    // NUMERIC query order (q2 < q10 < q100): a plain string sort runs
    // q100 between q10 and q11, so its time landed in the truncated head
    // of the r4 bench artifact. Ties (same number) fall back to name.
    // SPARK_GRAFT_ONLY=q105_..,q106_.. restricts the run — the isolated
    // scaling-probe mode (same warm-up + min-of-two harness as the full
    // artifact run, so probe numbers and BENCH numbers are comparable).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy { case (name, _) =>
        ("""\d+""".r.findFirstIn(name).map(_.toInt).getOrElse(Int.MaxValue), name)
      }
    // Untimed warm-up of EVERY query (JIT + codegen + parquet footers), so
    // first-touch costs don't land on whichever query runs first.
    queries.foreach { case (_, fn) =>
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    // Two timed passes, min per query (GC/compilation noise makes single
    // runs swing ±30%); a failed query records a NEGATIVE time so
    // failures are visible in BENCH json rather than masquerading as
    // fast successes.
    //
    // Each pass also records process-CPU seconds (whole-JVM delta across
    // the query — correct in local mode where driver + all executor
    // threads share one process). wall >> cpu/cores on a query that
    // didn't change is the signature of EXTERNAL contention in the
    // capture environment, not a code regression — the r7 artifact was
    // unusable for exactly this reason and needed manual re-runs to
    // adjudicate. cpu makes it diagnosable from the artifact alone.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timeOnce(name: String,
        fn: (SparkSession, String) => DataFrame): (Double, Double) = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      // failures go to stderr (the artifact captures stdout only) so a
      // negative bench number is diagnosable without re-running
      val ok = try { exec(fn(spark, sfDir)); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name FAILED: $e")
                 if (sys.env.contains("SPARK_GRAFT_DEBUG")) e.printStackTrace()
                 false
               }
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (osBean.getProcessCpuTime - c0) / 1e9
      (if (ok) dt else -dt, dc)
    }
    val detailed = queries.map { case (name, fn) =>
      val (a, b) = (timeOnce(name, fn), timeOnce(name, fn))
      // min-wall picks the faster pass (any failure is negative and
      // therefore wins the min, keeping failures visible); report that
      // same pass's cpu so the wall/cpu pair is internally consistent
      name -> (if (a._1 <= b._1) a else b)
    }
    val results = detailed.map { case (name, (wall, _)) => name -> wall }
    // Millisecond precision keeps the per-query JSON line compact (~3 KB
    // for 100 queries instead of ~6 KB of full-double digits).
    def fmt(v: Double): String = {
      val r = math.round(v * 1000).toDouble / 1000
      if (r == 0.0 && v != 0.0) (if (v < 0) "-0.001" else "0.001") else r.toString
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // "queries" stays a plain name→seconds map (the driver's parser
    // depends on that shape); the wall+cpu pairs ride in a parallel
    // "detail" map for the contention post-mortem.
    val det = detailed.map { case (k, (w, c)) =>
      s"\"" + k + "\":{\"wall\":" + fmt(w) + ",\"cpu\":" + fmt(c) + "}"
    }.mkString("{", ",", "}")
    val total = results.map { case (_, v) => math.abs(v) }.sum
    val totalCpu = detailed.map { case (_, (_, c)) => c }.sum
    val failed = results.count(_._2 < 0)
    // 1-minute system load average at end of run: load >> cores while
    // wall >> cpu pins the blame on co-tenant processes.
    val load = osBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"detail":$det,"sf":"$sfDir"}""")
    // The driver's artifact capture keeps the TAIL of the output; the
    // r3/r4 single-line form lost its leading total when the per-query
    // map outgrew the window, and the r8 capture kept only q114+ of the
    // big map. Two short lines land LAST so the tail always retains
    // (a) the slowest-queries head — the part of the per-query map an
    // expensive-query post-mortem actually needs — and (b) the headline
    // totals, even when the full line above is truncated.
    val slowest = results.sortBy { case (_, v) => -math.abs(v) }.take(20)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"slowest20","queries":$slowest,"unit":"sec","sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":$failed,"cpu_total":${fmt(totalCpu)},"load_avg":${fmt(load)},"cores":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
