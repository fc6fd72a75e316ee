package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Raw projections of a vector onto every plane row in one expression:
  * element `h` is `v · planes(h)` as a double — the margin source for
  * query-directed (ranked) multi-probe LSH (Lv et al., VLDB'07): a
  * signature bit whose projection sits close to the hyperplane is the
  * one most likely to be on the wrong side for a true near neighbor, so
  * probes flip bits in increasing |dot| order.
  *
  * Same single-fixed-loop construction as [[E2lshKeys]]/[[LshBucketIds]]
  * (the r13 JIT-threshold lesson: per-plane [[ConstVectorDot]]s fuse
  * into a whole-stage method that outgrows HotSpot's 8 KB bytecode limit
  * as the ladder widens — one expression generates constant-size code at
  * any rung), dotting through the shared [[DotKernel]] so interpreted
  * and generated paths are bit-identical and the DuckDB oracle's
  * `list_dot_product` against the inlined integer plane matrix rebuilds
  * the exact doubles. */
case class PlaneDots(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "plane_dots"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Double](planes.length)
    var h = 0
    while (h < planes.length) {
      out(h) = DotKernel.dot(arr, planes(h))
      h += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |double[] $out = new double[$w.length];
         |for (int $h = 0; $h < $w.length; $h++) {
         |  $out[$h] = graft.functions.DotKernel.dot($arr, $w[$h]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneDots =
    copy(child = newChild)
}

object PlaneDots {
  /** `array<double>` of `v · planes(h)` for every plane row `h`. */
  def planeDots(v: Column, planes: Array[Array[Double]]): Column =
    bridge.columnOf(PlaneDots(bridge.exprOf(v), planes))
}
