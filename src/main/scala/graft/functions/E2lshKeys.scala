package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All E2LSH quantized projections of a vector in one expression:
  * element `h` is `⌊(v · planes(h)) / width⌋` as a long — the bucket
  * coordinate grid of Datar et al.'s E2LSH, for every projection row at
  * once.
  *
  * The [[LshBucketIds]] story at a different post-dot transform: one
  * [[ConstVectorDot]]+`floor`/`cast` per projection fuses into a
  * whole-stage method that outgrows HotSpot's JIT threshold as the
  * corpus-adaptive ladder widens (224 projections at the 15k-user rung),
  * leaving the signature stage interpreted. Here the generated code is
  * one fixed nested loop regardless of rung, and the dot order, null
  * handling (null elements contribute 0, length = min(|v|, dim)) and
  * `Math.floor(dot / width)` sequence replicate the per-projection
  * composition exactly — the DuckDB oracle rebuilds these grid keys from
  * the inlined integer plane matrix, so the arithmetic is contract. */
case class E2lshKeys(child: Expression, planes: Array[Array[Double]],
                     width: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "e2lsh_keys"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](planes.length)
    var h = 0
    while (h < planes.length) {
      out(h) = math.floor(DotKernel.dot(arr, planes(h)) / width).toLong
      h += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      // generated code calls the SAME static kernel the interpreted path
      // runs ([[DotKernel]]) — bit-identical by construction, JIT-inlined
      s"""
         |long[] $out = new long[$w.length];
         |for (int $h = 0; $h < $w.length; $h++) {
         |  $out[$h] = (long) java.lang.Math.floor(
         |    graft.functions.DotKernel.dot($arr, $w[$h]) / $width);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): E2lshKeys =
    copy(child = newChild)
}

object E2lshKeys {
  /** `array<long>` of `⌊(v·planes(h))/width⌋` for every plane row `h`. */
  def e2lshKeys(v: Column, planes: Array[Array[Double]], width: Double): Column =
    bridge.columnOf(E2lshKeys(bridge.exprOf(v), planes, width))
}
