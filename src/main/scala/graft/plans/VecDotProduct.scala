package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential-order dot product over two float- or double-array
  * embeddings, accumulated in doubles: exactly the fold
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)`
  * the similarity queries used — element i cast to double, multiplied,
  * added left-to-right — so scores stay bit-identical to the DuckDB
  * oracle's list_aggregate fold.
  *
  * A native expression because higher-order functions are interpreted
  * AND allocate intermediate arrays per call: under a bucketed
  * self-join evaluating ~10⁵–10⁶ pairs per task, that allocation churn
  * turned into GC storms at high task parallelism. doGenCode reads the
  * floats straight from Tungsten ArrayData. */
case class VecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float>/array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  /** Whether a side holds floats (widened per element) or doubles
    * (read directly) — resolved statically, so codegen stays a tight
    * primitive loop with no per-element branching. */
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yv = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $xv * $yv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDotProduct {
  /** Column-level entry point — see [[graft.plans.SeqRatio.apply]]:
    * no session registry mutation. */
  def apply(l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumns.column(VecDotProduct(
      org.apache.spark.sql.GraftColumns.expression(l),
      org.apache.spark.sql.GraftColumns.expression(r)))

  /** Register as the SQL function `vec_dot` for the SQL-string
    * surface; Column-based plans use [[apply]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      (children: Seq[Expression]) => VecDotProduct(children(0), children(1)),
      "built-in")
}
