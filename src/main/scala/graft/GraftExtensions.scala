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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("tle_bstar"),
      info("tle_bstar", "decode TLE implied-decimal B* (reference quirks)"),
      col1("tle_bstar", TleFunctions.tleBstar)))
    ext.injectFunction((FunctionIdentifier("tle_bstar_strict"),
      info("tle_bstar_strict", "signed-mantissa-correct B* decode"),
      col1("tle_bstar_strict", TleFunctions.tleBstarStrict)))
    ext.injectFunction((FunctionIdentifier("tle_parse"),
      info("tle_parse", "parse a TLE line pair into an 11-field struct"),
      col2("tle_parse", TleFunctions.tleParse)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "fused dot product of two numeric arrays"),
      args => { require(args.length == 2); DotProduct(args(0), args(1)) }))
  }
}
