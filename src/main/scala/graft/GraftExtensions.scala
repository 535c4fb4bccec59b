package graft

import org.apache.spark.sql.{Column, GraftBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.TleFunctions
import graft.plans.DotProduct

/** SparkSessionExtensions hook (SURVEY.md §4 custom-work item 3): makes
  * the domain pack callable from SQL —
  *
  *   SELECT tle_bstar(b), tle_parse(l1, l2).norad_id, vec_dot(e, q) ...
  *
  * Everything but `vec_dot` resolves to the same Column-expression trees
  * the DSL builds (no UDFs — full codegen); `vec_dot` is the native
  * Catalyst expression. Activate via `GraftSession` (wired by default)
  * or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // Whole-operator custom plans (SURVEY §4 ladder rung c): the planner
    // strategy that turns AsOfJoinNode into AsOfJoinExec.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // SQL statement surface for the warehouse (SURVEY §2.2/§8; the Delta
    // injectParser shape): MERGE INTO / DELETE / UPDATE / INSERT /
    // VERSION AS OF / DESCRIBE HISTORY / RESTORE / VACUUM against names
    // a Warehouse.registerSql call routed. Parser injection only works
    // at session construction — cached foreign sessions keep the Scala
    // API + registerViews surface.
    ext.injectParser((s, delegate) => new graft.sql.GraftSqlParser(s, delegate))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def col1(name: String, f: Column => Column)(
      args: Seq[Expression]): Expression = {
    require(args.length == 1, s"$name expects 1 argument")
    GraftBridge.toExpr(f(GraftBridge.toColumn(args.head)))
  }

  private def col2(name: String, f: (Column, Column) => Column)(
      args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name expects 2 arguments")
    GraftBridge.toExpr(
      f(GraftBridge.toColumn(args(0)), GraftBridge.toColumn(args(1))))
  }

  /** The one registration table both activation paths share. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("tle_bstar"),
      info("tle_bstar", "decode TLE implied-decimal B* (reference quirks)"),
      col1("tle_bstar", TleFunctions.tleBstar) _),
    (FunctionIdentifier("tle_bstar_strict"),
      info("tle_bstar_strict", "signed-mantissa-correct B* decode"),
      col1("tle_bstar_strict", TleFunctions.tleBstarStrict) _),
    (FunctionIdentifier("tle_parse"),
      info("tle_parse", "parse a TLE line pair into an 11-field struct"),
      col2("tle_parse", TleFunctions.tleParse) _),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "fused dot product of two numeric arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2); DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("top_k"),
      info("top_k", "exact k largest values per group, descending (bounded-heap aggregate)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "top_k expects (col, k)")
        require(args(1).foldable,
          "top_k: k must be an integer literal, not a column")
        val k = args(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"top_k: k must be an integer literal, got $other")
        }
        // bare AggregateFunction — the analyzer wraps it
        graft.plans.TopKAgg(args(0), k)
      }),
    (FunctionIdentifier("mg_candidates"),
      info("mg_candidates",
        "Misra-Gries heavy-hitter candidates: every value with frequency" +
          " > n/(k+1) is guaranteed present (k-counter mergeable sketch)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "mg_candidates expects (col, k)")
        require(args(1).foldable,
          "mg_candidates: k must be an integer literal, not a column")
        val k = args(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"mg_candidates: k must be an integer literal, got $other")
        }
        graft.plans.HeavyHittersAgg(args(0), k)
      }),
    (FunctionIdentifier("z_interleave"),
      info("z_interleave",
        "2-D Morton (z-order) code of two non-negative 32-bit values"),
      col2("z_interleave", graft.functions.ZOrder.interleave) _),
    (FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "serialized bloom filter over a column's values " +
          "(mergeable; probe with graft.plans.BloomAgg.mightContain)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bloom_agg expects (col, expectedItems, fpp)")
        require(args(1).foldable && args(2).foldable,
          "bloom_agg: expectedItems and fpp must be literals")
        val items = args(1).eval() match {
          case i: Int => i.toLong
          case l: Long => l
          case s: Short => s.toLong
          case b: Byte => b.toLong
          case other => throw new IllegalArgumentException(
            s"bloom_agg: expectedItems must be integral, got $other")
        }
        val fpp = args(2).eval() match {
          case d: Double => d
          case f: Float => f.toDouble
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case other => throw new IllegalArgumentException(
            s"bloom_agg: fpp must be numeric, got $other")
        }
        graft.plans.BloomAgg(args(0), items, fpp)
      }))

  /** Register the pack on a session that ALREADY exists. Builder
    * extensions only run when the builder constructs a new session —
    * a cached `getOrCreate` hit would otherwise silently lack
    * tle_bstar/tle_parse/vec_dot in SQL. Idempotent (re-registration
    * overwrites with the identical builder).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      GraftBridge.registerFunction(spark, ident, inf, builder)
    }
    // Planner strategies for cached sessions ride the public
    // `experimental` hook (same planner list the extension injection
    // feeds; AQE re-planning consults it too). The guard checks the
    // PLANNER's assembled strategy list, not just extraStrategies —
    // a session built with GraftExtensions already carries the strategy
    // via injectPlannerStrategy and must not get a duplicate here.
    val planned = GraftBridge.plannerStrategies(spark)
    if (!planned.contains(graft.plans.AsOfJoinStrategy) &&
        !spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
