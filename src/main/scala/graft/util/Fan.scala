package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out for CPU-heavy per-row derivations (r15,
  * guide §2: "make partitioning scale-adaptive — derive from input
  * size rather than a constant").
  *
  * Spark splits scans by BYTES (`maxPartitionBytes`), which is the
  * right currency for I/O-bound work but blind to per-row CPU: a
  * 15 MB single-file batch feeding a 64-hash MinHash signing or a
  * shingle explode runs as ONE task, pinning minutes of expression
  * work to one core (the q128 profile showed 4.4–4.8 s single-task
  * stages doing exactly this). [[widen]] repartitions such inputs to
  * the session's parallelism — and is an explicit NO-OP whenever the
  * input already carries at least that many partitions, so at
  * warehouse scale (many splits) it adds nothing: the repartition
  * only fires where the alternative was single-core execution.
  */
object Fan {

  /** `df`, round-robin-repartitioned to `spark.defaultParallelism`
    * when its physical plan currently yields fewer partitions; `df`
    * unchanged otherwise.
    *
    * Inspecting the partition count forces ONE extra physical planning
    * of `df` (`toRdd` — the internal-row RDD, NOT `.rdd`, whose
    * external-Row deserializer layer this probe does not need; no job
    * runs). The extra planning is accepted and bounded: every caller
    * passes a scan-rooted plan (a micro-batch or a doc-table read)
    * whose planning is milliseconds, sitting in front of seconds of
    * per-row derivation — and the alternative (deciding from logical-
    * plan size ESTIMATES) mis-fires exactly where widen matters, e.g.
    * streaming sources whose default sizeInBytes is Long.Max.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val current = df.queryExecution.toRdd.getNumPartitions
    if (current >= target) df else df.repartition(target)
  }
}
