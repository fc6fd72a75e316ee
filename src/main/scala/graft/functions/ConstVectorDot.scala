package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of an `array<double>` column with a plan-constant weight
  * vector — the projection primitive for random-hyperplane LSH and other
  * fixed-basis transforms over embedding columns.
  *
  * A native expression (vs `aggregate(zip_with(...))`) because the
  * weights are per-plan constants: they ride along as one codegen
  * reference object and the generated code is a tight primitive loop with
  * no per-row lambda machinery. Null elements are treated as 0.
  */
case class ConstVectorDot(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "const_vector_dot"

  override def nullSafeEval(input: Any): Any =
    DotKernel.dot(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    // generated code calls the SAME static kernel the interpreted path
    // runs ([[DotKernel]]) — bit-identical by construction, JIT-inlined
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.DotKernel.dot($arr, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): ConstVectorDot =
    copy(child = newChild)
}

object ConstVectorDot {
  /** `v · w` for an `array<double>` column and constant weights. */
  def dotConst(v: Column, w: Array[Double]): Column =
    bridge.columnOf(ConstVectorDot(bridge.exprOf(v), w))
}
