package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd squared Euclidean distance over two `array<double>` columns —
  * the reference's distance kernel (/root/reference/mapper.py:26-30,
  * master.py:90-94) generalized to N-D and compiled to a primitive loop.
  *
  * Semantically identical to the HOF composition
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0d, (acc,v) => acc+v)`
  * ([[graft.core.Vec.sqDist]]): same left-to-right accumulation order, so
  * results are bit-equal and the DuckDB oracles hold unchanged. The win is
  * mechanical: no per-row zip_with array allocation, no lambda-variable
  * boxing — just two `ArrayData.getDouble` streams in a fused loop, inside
  * whole-stage codegen. This is the K-Means assignment inner loop, executed
  * K times per input row — the hottest kernel at 100 TB.
  *
  * Nulls: returns null if either array is null (standard binary-expression
  * semantics); array ELEMENTS are assumed non-null (vector data).
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"SquaredDistance expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  /** Column-level entry point, interchangeable with [[graft.core.Vec.sqDist]]. */
  def apply(a: Column, b: Column): Column =
    graftbridge.toColumn(
      SquaredDistance(graftbridge.toExpression(a), graftbridge.toExpression(b)))
}
