package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns — the similarity
  * kernel behind cosine ([[graft.core.Vec.cosine]]) and the embedding
  * near-dup join residual (SimilarityQueries q_dedup_embed).
  *
  * Bit-equal to the HOF composition
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (acc,v) => acc+v)`
  * ([[graft.core.Vec.dot]]) in ALL cases — same left-to-right accumulation
  * order; null on length mismatch (zip_with null-pads the shorter array and
  * the null poisons the sum); null on null elements (checked only when the
  * array type admits them). So [[graft.plans.RewriteDot]] can swap this in
  * for the HOF spelling anywhere, and the DuckDB oracles hold unchanged.
  *
  * Why it matters: when the dot lands in a join's residual condition (LSH
  * bucket join + exact-cosine verify), the HOF form allocates a zip_with
  * array per candidate PAIR — an allocation storm exactly where pair counts
  * explode. This kernel is two `ArrayData.getDouble` streams in a fused
  * loop, zero allocation, inside whole-stage codegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"DotProduct expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // Length mismatch / null elements yield null (zip_with parity), so the
  // result can be null even over non-null children.
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = {
    def cn(t: DataType) = t match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
    cn(left.dataType) || cn(right.dataType)
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // zip_with would null-pad -> null sum
    val checkNulls = elementsNullable
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // isNullAt branch compiled in only when the schema admits null
      // elements; dense vector columns keep the branch-free loop.
      val nullElemCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point, interchangeable with [[graft.core.Vec.dot]]. */
  def apply(a: Column, b: Column): Column =
    graftbridge.toColumn(
      DotProduct(graftbridge.toExpression(a), graftbridge.toExpression(b)))
}
