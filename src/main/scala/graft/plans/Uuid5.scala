package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic UUIDv5 (RFC 4122 name-based SHA-1, the reference's
  * fixed namespace — see [[graft.functions.Ids.uuid5]], reference
  * common.py:72-74) as a native Catalyst expression.
  *
  * The typed cluster-merge fold calls the Scala kernel directly; this
  * expression is the column-level surface for everything OUTSIDE the
  * typed path — deriving stable ids for documents/chunks/contacts in
  * plain projections — where a Scala UDF would box every row and break
  * whole-stage codegen. `doGenCode` emits a direct static call on
  * UTF8String, same device as [[SeqRatio]].
  */
case class Uuid5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "uuid5"

  override protected def nullSafeEval(v: Any): Any =
    graft.functions.Ids.uuid5UTF8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Ids.uuid5UTF8($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Uuid5 {
  /** Column-level entry point: builds the expression directly (via
    * [[org.apache.spark.sql.GraftColumns]]) so plan construction never
    * mutates the session function registry. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumns.column(
      Uuid5(org.apache.spark.sql.GraftColumns.expression(c)))

  /** Register as the SQL function `uuid5` for callers on the
    * SQL-string surface. Column-based plans use [[apply]] instead and
    * never touch the registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "uuid5",
      (children: Seq[Expression]) => Uuid5(children.head),
      "built-in")
}
