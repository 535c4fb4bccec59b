package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TleFunctions

/** Order-preserving ingestion of raw TLE text (S1/S2/T1/X2/T5).
  *
  * The reference reads the whole HTTP payload and walks consecutive line
  * triples `(name, line1, line2)`, silently dropping a trailing partial
  * triple (`/root/reference/script.py:119-130`). `spark.read.text` gives
  * no order guarantee, so the line index comes from RDD `zipWithIndex` —
  * distributed and order-correct for text sources (index = split offset
  * order), at the cost of one extra partition-size count job. After
  * indexing, triple assembly is a plain hash aggregation on `idx div 3`:
  * fully parallel, one shuffle, no single-task window.
  */
object TleText {

  private val linesSchema = StructType(Seq(
    StructField("grp", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("line", StringType)))

  /** Lines → `(grp, name, l1, l2)` triples, trailing partial dropped.
    *
    * Reference parity: the payload is stripped BEFORE splitting
    * (`response.text.strip().splitlines()`, script.py:119), so leading
    * and trailing blank lines must not shift triple alignment — interior
    * blank lines DO count, exactly as in the reference. Implemented as
    * one cheap bounds pass (min/max index of non-blank lines) plus a
    * re-index; both passes are distributed.
    */
  /** @param assumeAlignedFiles multi-file input is only sound when every
    *   file holds a WHOLE number of triples (no record straddles a file
    *   boundary — e.g. a landing writer that emits one full 3-line record
    *   per text row). Callers that guarantee that may opt in; by default
    *   multi-file directories are rejected, because global zipWithIndex
    *   would silently align triples ACROSS file boundaries in listing
    *   order. The per-file `graft-tle` DSv2 source is the general
    *   multi-file path.
    */
  def triples(spark: SparkSession, path: String,
      assumeAlignedFiles: Boolean = false): DataFrame = {
    // Single-payload contract: the global zipWithIndex order is only the
    // payload's line order when the input is ONE file (the reference
    // fetches exactly one HTTP body, script.py:119).
    if (!assumeAlignedFiles) {
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val matched = Option(fs.globStatus(hPath)).map(_.toSeq).getOrElse(Nil)
      val dataFiles = matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter { s =>
            val n = s.getPath.getName
            s.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
        else Seq(st)
      }
      require(dataFiles.size <= 1,
        s"TleText.triples requires a single payload file; '$path' resolves " +
          s"to ${dataFiles.size} files. Use spark.read.format(\"graft-tle\") " +
          "for multi-file landing directories (per-file triple alignment), " +
          "or pass assumeAlignedFiles=true if every file holds whole triples.")
    }
    val indexed = spark.sparkContext.textFile(path).zipWithIndex()
    val bounds = indexed
      .filter { case (line, _) => line.trim.nonEmpty }
      .map { case (_, idx) => (idx, idx) }
      .fold((Long.MaxValue, Long.MinValue)) { case ((lo1, hi1), (lo2, hi2)) =>
        (math.min(lo1, lo2), math.max(hi1, hi2))
      }
    if (bounds._1 > bounds._2)
      return groupTriples(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], linesSchema))
    val (lo, hi) = bounds
    val rows = indexed
      .filter { case (_, idx) => idx >= lo && idx <= hi }
      .map { case (line, idx) =>
        Row((idx - lo) / 3, ((idx - lo) % 3).toInt, line)
      }
    groupTriples(spark.createDataFrame(rows, linesSchema))
  }

  /** Triple assembly over an already-indexed lines frame. */
  def groupTriples(indexed: DataFrame): DataFrame =
    indexed
      .groupBy(col("grp"))
      .agg(
        max(when(col("pos") === 0, col("line"))).as("name"),
        max(when(col("pos") === 1, col("line"))).as("l1"),
        max(when(col("pos") === 2, col("line"))).as("l2"),
        count(lit(1)).as("n"))
      .where(col("n") === 3) // drop-partial-trailer (script.py:124)
      .select(col("grp"),
        trim(col("name")).as("sat_name"), // per-line strip (script.py:125-127)
        trim(col("l1")).as("l1"),
        trim(col("l2")).as("l2"))

  /** Full S1→T1→X2→T5 parse: text file → valid TLE records with
    * `sat_name` and the batch-constant `fetched_at_utc` attached
    * (script.py:120,128-130). Malformed records are dropped, never fail
    * the job.
    */
  def records(spark: SparkSession, path: String,
      fetchedAt: java.sql.Timestamp,
      assumeAlignedFiles: Boolean = false): DataFrame = {
    val parsed = triples(spark, path, assumeAlignedFiles)
      .withColumn("r", TleFunctions.tleParse(col("l1"), col("l2")))
      .where(col("r").isNotNull) // T5: null-then-drop
    parsed.select(
      col("r.norad_id").as("norad_id"),
      col("sat_name"),
      col("r.intl_designator").as("intl_designator"),
      col("r.epoch_utc").as("epoch_utc"),
      lit(fetchedAt).as("fetched_at_utc"),
      col("r.inclination").as("inclination"),
      col("r.raan").as("raan"),
      col("r.eccentricity").as("eccentricity"),
      col("r.arg_perigee").as("arg_perigee"),
      col("r.mean_anomaly").as("mean_anomaly"),
      col("r.mean_motion").as("mean_motion"),
      col("r.b_star_drag").as("b_star_drag"),
      col("r.rev_number").as("rev_number"))
  }
}
