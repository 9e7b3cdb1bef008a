package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `popcount(A AND B)` over two equal-width long-array bitsets — the
  * hot per-pair intersect of the set-similarity joins (DedupOps q53
  * bitset path).
  *
  * A native Catalyst expression instead of a Scala UDF: `doGenCode`
  * reads the packed words straight out of Tungsten `ArrayData` inside
  * whole-stage codegen, where the UDF equivalent pays a boxed
  * `Seq[Long]` conversion per row — at ~10⁷ candidate pairs per task
  * that conversion dominated the join. */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bitset_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitsetIntersectCount {
  /** Column-level entry point — see [[graft.plans.SeqRatio.apply]]:
    * no session registry mutation. */
  def apply(l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumns.column(BitsetIntersectCount(
      org.apache.spark.sql.GraftColumns.expression(l),
      org.apache.spark.sql.GraftColumns.expression(r)))

  /** Register as the SQL function `bitset_intersect_count` for the
    * SQL-string surface; Column-based plans use [[apply]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bitset_intersect_count",
      (children: Seq[Expression]) => BitsetIntersectCount(children(0), children(1)),
      "built-in")
}
