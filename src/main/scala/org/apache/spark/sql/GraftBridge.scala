/*
 * Lives in org.apache.spark.sql ONLY to reach the classic Column <->
 * Expression converters, which are `private[sql]`. This is the standard
 * packaging for Spark extension libraries that ship custom Catalyst
 * expressions behind a Column DSL (the public API offers no conversion).
 * Nothing else may go in this package.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

object GraftBridge {
  /** Eagerly convert the Column's node tree into catalyst expressions
    * (UnresolvedFunction etc.) that the analyzer can resolve — the lazy
    * `ExpressionUtils.expression` wrapper stays a ColumnNodeExpression,
    * which is Unevaluable when returned from an injected FunctionBuilder.
    */
  def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Register a SQL function on an ALREADY-BUILT session (sessionState is
    * `private[sql]`). `SparkSessionExtensions` only fire when the builder
    * creates a new session; this is the path for sessions `getOrCreate`
    * returned from cache, so the graft pack is never silently missing.
    */
  def registerFunction(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** Parse a SQL expression string to its unresolved Catalyst AST
    * (`sessionState` is `private[sql]`) — shape analysis of
    * generated-column definitions (hidden-partitioning pruners).
    */
  def parseExpression(spark: SparkSession, sql: String): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parseExpression(sql)

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — the construction path for whole-operator custom
    * nodes (graft.plans.AsOfJoinNode) that have no Column-DSL spelling.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame — resolved attributes for
    * splicing into a custom logical node.
    */
  def analyzed(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Rebuild a v1 Sink's `addBatch` DataFrame as a plain BATCH plan over
    * the micro-batch's RDD — the exact ForeachBatchSink recipe
    * (`LogicalRDD.fromDataset(toRdd, ..., isStreaming = false)`). The
    * incoming Dataset is bound to the incremental execution; re-planning
    * it through batch writers (the warehouse append path) needs this
    * re-wrap.
    */
  def freshBatch(data: Dataset[Row]): DataFrame = {
    val ds = data.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        ds.queryExecution.toRdd, ds, isStreaming = false))
  }

  /** Stable per-session identity (`sessionUUID` lives on the classic
    * session) — the key the warehouse SQL registry scopes its
    * name→table routes by, so two sessions' registrations never collide.
    */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** The session planner's assembled strategy list (extension-injected +
    * experimental) — lets registration code test "already planned?"
    * instead of guessing from extraStrategies alone.
    */
  def plannerStrategies(spark: SparkSession): Seq[AnyRef] =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.planner.strategies
}
