package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two `array<float>` columns, accumulated in double in
  * index order — a custom Catalyst expression with whole-stage codegen.
  *
  * This exists for the similarity-search hot path: the equivalent
  * higher-order-function plan (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * is evaluated interpreted, one lambda call per element, which dominates
  * all-pairs cosine at corpus scale (~40× slower end-to-end on the bench's
  * 2 M-pair near-duplicate scan). The generated code is a tight primitive
  * loop inside the join stage. Accumulation order matches the HOF form, so
  * results are bit-identical (oracle-safe).
  *
  * Null elements inside the arrays are not expected (embedding vectors);
  * mismatched lengths dot the common prefix.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float>; callers own the contract (ExpectsInputTypes
  // is private[sql] in Spark 4, so there is no declarative check here)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level API for [[FloatVectorDot]]. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
