package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the reference's quality gate
  * (K5: "refuse to load an empty batch", `/root/reference/script.py:60-70`)
  * generalized to the constraint families a warehouse load actually
  * needs: completeness, key uniqueness, value ranges, referential
  * integrity. Output is one `(check, violations)` row per declared
  * constraint, so a gate is `audit(...).where($"violations" > 0).isEmpty`.
  *
  * Scale shape: every row-local predicate (NotNull / InRange) fuses
  * into ONE conditional-count aggregate — a single scan regardless of
  * how many such checks are declared. Unique adds one shuffle on its
  * key columns; RefIntegrity is an anti-join that broadcasts the dim
  * side when small (the usual star-schema case). Nothing collects to
  * the driver but the per-check counts.
  */
object QualityAudit {

  sealed trait Check { def name: String }

  /** Column must contain no nulls. */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null($col)"
  }

  /** Key columns must identify at most one row. */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
  }

  /** Values must lie in [lo, hi]; nulls are NOT range violations
    * (declare NotNull separately — one failure, one cause).
    */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($col,$lo,$hi)"
  }

  /** Every non-null FK value must exist in the dimension. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
    extends Check {
    val name = s"ref($col)"
  }

  /** Run all checks; returns (check: String, violations: Long), in the
    * declared order.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val indexed = checks.zipWithIndex
    // 1. fuse all row-local predicates into one aggregate pass; each
    // branch carries its declared index from construction (duplicate
    // check names stay distinct rows in declared order)
    val rowLocal: Seq[(String, Int, Column)] = indexed.collect {
      case (c: NotNull, i) =>
        (c.name, i, sum(when(col(c.col).isNull, 1L).otherwise(0L)))
      case (c: InRange, i) =>
        (c.name, i, sum(when(col(c.col).isNotNull &&
          !col(c.col).between(c.lo, c.hi), 1L).otherwise(0L)))
    }
    val fused: Option[DataFrame] = if (rowLocal.isEmpty) None else Some {
      val agged = df.agg(rowLocal.head._3.as("c0"),
        rowLocal.tail.zipWithIndex.map { case ((_, _, e), i) => e.as(s"c${i + 1}") }: _*)
      val triples = rowLocal.zipWithIndex.map { case ((n, ord, _), i) =>
        struct(lit(n).as("check"),
          coalesce(col(s"c$i"), lit(0L)).as("violations"),
          lit(ord).as("_ord"))
      }
      agged.select(explode(array(triples: _*)).as("kv"))
        .select(col("kv.check"), col("kv.violations"), col("kv._ord"))
    }
    // 2. per-check plans for the ones that need their own shape
    val shaped: Seq[DataFrame] = indexed.collect {
      case (c: Unique, i) =>
        df.groupBy(c.cols.map(col): _*).count().where(col("count") > 1)
          .agg(coalesce(sum(col("count") - 1), lit(0L)).as("violations"))
          .select(lit(c.name).as("check"), col("violations"), lit(i).as("_ord"))
      case (c: RefIntegrity, i) =>
        df.where(col(c.col).isNotNull)
          .join(c.dim.select(col(c.dimCol).as(c.col)).distinct(),
            Seq(c.col), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(c.name).as("check"), col("violations"), lit(i).as("_ord"))
    }
    (fused.toSeq ++ shaped).reduce(_ unionByName _)
      .orderBy("_ord").drop("_ord")
  }
}
