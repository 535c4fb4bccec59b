package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DateType, StructField, StructType}

import graft.schema.Schemas

/** Parquet-backed warehouse — the sandbox stand-in for the reference's
  * PostgreSQL star schema (SURVEY.md §2.2; JDBC writer options live in
  * `graft.sink.JdbcSink` and are exercised against embedded Derby in
  * tests). Append-only, like the reference's `if_exists='append'` sinks.
  */
class Warehouse(spark: SparkSession, dir: String) {

  val tables: Map[String, StructType] = Map(
    "dim_satellites" -> Schemas.dimSatellites,
    "fact_space_weather" -> Schemas.factSpaceWeather,
    // fact_telemetry is DATE-PARTITIONED on epoch_date (engine addition;
    // the reference's Postgres leans on an index instead): the 3-day
    // recent-keys scan that guards every telemetry load then prunes to
    // ~3 partitions instead of scanning all history — the difference
    // between O(days) and O(corpus) at warehouse scale.
    "fact_telemetry" -> Schemas.factTelemetry.add(
      StructField("epoch_date", DateType)))

  /** Partition-column layout per table (empty = unpartitioned). */
  val partitioning: Map[String, Seq[String]] = Map(
    "dim_satellites" -> Nil,
    "fact_space_weather" -> Nil,
    "fact_telemetry" -> Seq("epoch_date"))

  private def path(name: String) = s"$dir/$name"

  /** K1 — idempotent bootstrap, the `CREATE TABLE IF NOT EXISTS` analog
    * (`/root/reference/script.py:77-83`). Unlike the reference (which
    * bootstraps only `fact_space_weather` and assumes the other two
    * pre-exist — §2.12.6), ALL tables are created.
    */
  def bootstrap(): Unit = tables.foreach { case (name, schema) =>
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val w = empty.write
      (partitioning(name) match {
        case Nil => w
        case cols => w.partitionBy(cols: _*)
      }).parquet(path(name))
    }
  }

  def read(name: String): DataFrame =
    spark.read.schema(tables(name)).parquet(path(name))

  /** K2-K4 — append insert. Parquet has no JDBC-style `batchsize`, so
    * chunking maps to output-partition sizing: rows-per-file caps the
    * unit of write the way `chunksize=1000` caps the reference's insert
    * batches (`script.py:171`).
    *
    * Partitioned tables are REPARTITIONED BY THE PARTITION COLUMNS
    * before the write: a dynamic-partition write without it has every
    * task emit one file per partition value it happens to hold —
    * O(tasks × dates) tiny files per append (measured 32 × 365 ≈ 11k
    * for a one-year batch), which poisons every later scan with file
    * and footer overhead. Clustered, each partition directory is
    * written by exactly one task (maxRecordsPerFile still splits
    * oversized ones); a skewed hot date is exactly what AQE-less
    * `repartition(col)` handles worst, so rowsPerFile remains the cap.
    */
  def append(name: String, df: DataFrame, rowsPerFile: Long = 0): Unit = {
    val parts = partitioning(name)
    val clustered = parts match {
      case Nil => df
      case cols =>
        df.repartition(cols.map(org.apache.spark.sql.functions.col): _*)
    }
    val w0 = clustered.write.mode("append")
    val w1 = if (rowsPerFile > 0) w0.option("maxRecordsPerFile", rowsPerFile)
             else w0
    (parts match {
      case Nil => w1
      case cols => w1.partitionBy(cols: _*)
    }).parquet(path(name))
  }

  /** MERGE upsert (copy-on-write): rows of `updates` REPLACE existing
    * rows with the same key; unmatched update rows insert. The engine
    * analog of `MERGE INTO` / Delta upsert — the star-schema maintenance
    * op the reference's append-only sinks can't express (late-arriving
    * corrected TLEs currently just accumulate; §2.12's check-then-write
    * only prevents re-inserts).
    *
    * Scale shape: for a partitioned table only the partitions the update
    * batch TOUCHES are read, rewritten, and swapped (dynamic partition
    * overwrite) — cost scales with the update batch's partition
    * footprint, not table history. The touched partition VALUES (one row
    * per partition, not data) are collected to build a statically-pruned
    * scan. Unpartitioned tables rewrite fully (copy-on-write floor).
    *
    * Contracts (asserted where cheap, documented where not):
    *   - `updates` must be key-unique (caller dedups; `Dedup.keepFirst`);
    *   - partition columns must be a pure function of the key (true for
    *     `epoch_date` = date(epoch_utc)): a key can then never "move"
    *     partitions, so replaced rows always live in touched partitions.
    */
  def merge(name: String, updates: DataFrame, keys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val parts = partitioning(name)
    require(parts.forall(updates.columns.contains),
      s"merge into $name: updates must carry partition cols $parts")
    val target = read(name)
    // empty-batch no-op guards live per branch so a non-empty merge
    // never pays an extra pass over the updates plan: the partitioned
    // branch detects emptiness from the touched-partitions collect it
    // needs anyway; only the unpartitioned branch (which would
    // otherwise rewrite the WHOLE table through overwrite's
    // delete-before-commit window) runs a dedicated isEmpty probe
    val existing = parts match {
      case Nil =>
        if (updates.isEmpty) return
        target
      case cols =>
        // one row per touched partition — tiny by the batch-footprint
        // contract; <=> keeps null partition values mergeable
        val touched = updates.select(cols.map(col): _*).distinct().collect()
        if (touched.isEmpty) return
        val pred = touched.toSeq.map(r =>
          cols.zipWithIndex.map { case (c, i) => col(c) <=> lit(r.get(i)) }
            .reduce(_ && _)).reduce(_ || _)
        target.where(pred)
    }
    val merged = existing
      .join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates.select(existing.columns.map(col): _*))
      // materialize BEFORE the overwrite: the plan reads the same files
      // the write below replaces
      .localCheckpoint()
    overwriteClustered(name, merged)
  }

  /** The copy-on-write write tail shared by [[merge]] and [[compact]]:
    * cluster by the partition columns (one task per touched partition
    * dir) and swap in via dynamic partition overwrite; unpartitioned
    * tables rewrite whole. One implementation so the two maintenance
    * ops can't drift.
    *
    * @param rowsPerFile >0 caps rows per output file
    * @param flatFiles   >0 coalesces an UNPARTITIONED rewrite to this
    *                    many files (0 keeps the frame's partitioning)
    */
  private def overwriteClustered(name: String, df: DataFrame,
      rowsPerFile: Long = 0, flatFiles: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    val parts = partitioning(name)
    val clustered = parts match {
      case Nil => if (flatFiles > 0) df.coalesce(flatFiles) else df
      case cols => df.repartition(cols.map(col): _*)
    }
    val w0 = clustered.write.mode("overwrite")
    val w1 = if (rowsPerFile > 0) w0.option("maxRecordsPerFile", rowsPerFile)
             else w0
    (parts match {
      case Nil => w1
      case cols => w1.option("partitionOverwriteMode", "dynamic")
        .partitionBy(cols: _*)
    }).parquet(path(name))
  }

  /** Small-file COMPACTION — the maintenance op every long-lived
    * append-target needs: each append writes its own files, and after
    * thousands of batches a partition holds thousands of KB-sized
    * parquet files whose footer/open overhead dominates every scan
    * (q46 measured 11k small files tripling the pipeline's read side).
    *
    * Per partition directory, compares the file count against
    * ceil(bytes / targetBytes): directories already at or under the
    * ideal count are left BYTE-UNTOUCHED (no rewrite amplification —
    * compaction must be safely re-runnable as a no-op), the rest are
    * read back with a statically-pruned scan, re-clustered, and swapped
    * in via dynamic partition overwrite — the same bounded-footprint
    * copy-on-write contract as [[merge]]: cost scales with the
    * fragmented partitions' bytes, never with table history.
    *
    * @return (partitionsRewritten, filesBefore, filesAfter) over the
    *         rewritten directories only
    */
  def compact(name: String, targetBytes: Long = 128L * 1024 * 1024,
      rowsPerFile: Long = 0): (Int, Long, Long) = {
    import org.apache.spark.sql.functions.{col, lit}
    val parts = partitioning(name)
    // leaf data files grouped by partition directory (relative path);
    // the hidden/temp rule is the shared FsListing one
    def byDir(): Map[String, Seq[(String, Long)]] =
      graft.util.FsListing.dataFiles(path(name))
        .groupBy { case (rel, _) => rel.split('/').init.mkString("/") }
    val fragmented = byDir().filter { case (_, fl) =>
      val ideal = math.max(1L, (fl.map(_._2).sum + targetBytes - 1) / targetBytes)
      fl.size > ideal
    }
    if (fragmented.isEmpty) return (0, 0L, 0L)
    val before = fragmented.values.map(_.size.toLong).sum
    val bytes = fragmented.values.map(_.map(_._2).sum).sum
    // partition predicate from the k=v directory names — decoded with
    // Hive's OWN unescaping (URLDecoder is not its inverse: it would
    // turn a literal '+' into a space and throw on a bare '%'); null
    // partitions land in Hive's default-partition dir
    val pruned = parts match {
      case Nil => read(name)
      case cols =>
        import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        val preds = fragmented.keys.toSeq.map { dir =>
          dir.split('/').zip(cols).map { case (comp, c) =>
            val v = ExternalCatalogUtils.unescapePathName(
              comp.stripPrefix(s"$c="))
            if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
              col(c).isNull
            else col(c) <=> lit(v).cast(tables(name)(c).dataType)
          }.reduce(_ && _)
        }
        read(name).where(preds.reduce(_ || _))
    }
    val materialized = pruned.localCheckpoint() // reads files the write replaces
    // honor targetBytes in BOTH layouts: the partitioned branch writes
    // one task per partition dir, so oversized partitions are split by
    // maxRecordsPerFile — estimated from the measured bytes-per-row of
    // the data being rewritten when the caller didn't pin rowsPerFile
    // (count is metadata-cheap on the checkpointed frame)
    val effRows =
      if (rowsPerFile > 0) rowsPerFile
      else {
        val n = materialized.count()
        if (n == 0) 0L else math.max(1L, targetBytes * n / math.max(bytes, 1L))
      }
    overwriteClustered(name, materialized, rowsPerFile = effRows,
      flatFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt)
    val after = byDir().filter { case (d, _) => fragmented.contains(d) }
      .values.map(_.size.toLong).sum
    (fragmented.size, before, after)
  }
}
