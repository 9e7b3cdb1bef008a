package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ratcliff–Obershelp similarity (difflib `SequenceMatcher.ratio`
  * parity — see [[graft.functions.Similarity.seqRatio]]) as a native
  * Catalyst expression.
  *
  * The dedupe pair decision (reference merge.py:35-84) evaluates this
  * once per candidate pair. As a codegen expression the call stays
  * inside the whole-stage-generated join loop — the typed-Dataset
  * alternative pays a full MatchRec deserialization per pair, which
  * dominated the q45 edge stage on key-overlap-heavy corpora
  * (hundreds of thousands of candidate pairs). Same device as
  * [[BitsetIntersectCount]]: `doGenCode` emits a direct static call.
  */
case class SeqRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "seq_ratio"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.Similarity.ratioUTF8(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Similarity.ratioUTF8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SeqRatio {
  /** Column-level entry point: builds the expression directly (via
    * [[org.apache.spark.sql.GraftColumns]]) so plan construction never
    * mutates the session function registry. */
  def apply(l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumns.column(SeqRatio(
      org.apache.spark.sql.GraftColumns.expression(l),
      org.apache.spark.sql.GraftColumns.expression(r)))

  /** Register as the SQL function `seq_ratio` for callers on the
    * SQL-string surface. Column-based plans use [[apply]] instead and
    * never touch the registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "seq_ratio",
      (children: Seq[Expression]) => SeqRatio(children(0), children(1)),
      "built-in")
}
