package graft

import org.apache.spark.sql.functions._

import graft.pipeline.QualityAudit
import graft.pipeline.QualityAudit._

class QualityAuditSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dim = Seq(1L, 2L, 3L).toDF("id")

  test("each check counts exactly its planted violations, in order") {
    val df = Seq(
      (1L, Some(1L), 10.0), (2L, Some(2L), -5.0), // range violation
      (3L, None, 20.0),                           // null FK
      (3L, Some(9L), 30.0),                       // dup key + orphan FK
      (4L, Some(3L), 2e9)                         // range violation (high)
    ).toDF("k", "fk", "v")
    val out = QualityAudit.audit(df, Seq(
      NotNull("fk"), Unique(Seq("k")), InRange("v", 0.0, 100.0),
      RefIntegrity("fk", dim, "id")))
      .as[(String, Long)].collect()
    assert(out.toSeq === Seq(
      "not_null(fk)" -> 1L,
      "unique(k)" -> 1L,
      "in_range(v,0.0,100.0)" -> 2L,
      "ref(fk)" -> 1L))
  }

  test("a clean table audits to all zeros; null is not a range violation") {
    val df = Seq((1L, Some(1L), 10.0), (2L, None, 20.0))
      .toDF("k", "fk", "v")
    val out = QualityAudit.audit(df, Seq(
      Unique(Seq("k")), InRange("v", 0.0, 100.0),
      RefIntegrity("fk", dim, "id")))
      .as[(String, Long)].collect()
    assert(out.forall(_._2 === 0L))
  }

  test("row-local checks fuse into a single aggregate pass") {
    val df = Seq((1L, 1.0)).toDF("k", "v")
    val audited = QualityAudit.audit(df, Seq(
      NotNull("k"), NotNull("v"), InRange("v", 0.0, 1.0)))
    val scans = "LocalTableScan".r
      .findAllIn(audited.queryExecution.executedPlan.toString).size
    assert(scans === 1, "3 row-local checks must share one scan")
    assert(audited.count() === 3)
  }

  test("empty input yields zero violation counts, not nulls") {
    val df = Seq((1L, 1.0)).toDF("k", "v").limit(0)
    val out = QualityAudit.audit(df, Seq(NotNull("k"), Unique(Seq("k"))))
      .as[(String, Long)].collect()
    assert(out.toSeq === Seq("not_null(k)" -> 0L, "unique(k)" -> 0L))
  }
}
