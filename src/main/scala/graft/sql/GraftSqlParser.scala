package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** The injected session parser (`SparkSessionExtensions.injectParser`,
  * the Delta shape): graft maintenance statements first, then the
  * delegate's full Spark SQL grammar, then [[WarehouseSql.route]]
  * re-targeting any warehouse-named DML/relations in the parsed plan.
  * Everything else delegates untouched — the wrapper adds syntax and
  * routing, never alters Spark SQL semantics for non-warehouse names.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    WarehouseSql.parseStatement(session, sqlText)
      .getOrElse(WarehouseSql.route(session, delegate.parsePlan(sqlText)))

  // parseQuery serves view/CTE bodies — reads may name warehouse tables
  override def parseQuery(sqlText: String): LogicalPlan =
    WarehouseSql.rewriteReads(session, delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
