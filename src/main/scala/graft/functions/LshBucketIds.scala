package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All sign-LSH bucket ids of a vector in one expression: for table
  * `t < tables`, bit `j < bits` is `(v · planes(t*bits + j)) > 0`, and
  * `bucket(t) = Σ_j bit_j << j` — returned as `array<int>` of length
  * `tables`.
  *
  * Exists for codegen SIZE, not expressiveness: the same signatures as a
  * `tables*bits`-element array of [[ConstVectorDot]] comparisons, but one
  * [[ConstVectorDot]] PER PLANE fuses into a whole-stage method that
  * grows ~70 bytecode lines per plane — past HotSpot's ~8 KB JIT
  * threshold the method runs interpreted, and the r12 corpus-adaptive
  * ladder walked straight into it (measured on the sf1 corpus: 24 planes
  * 0.98 s, 48 planes 3.6 s for the same 20 k rows — 2× the work, 4× the
  * time). Here the generated code is one fixed ~20-line nested loop no
  * matter the rung, so signature cost scales with `tables*bits*dim`
  * arithmetic instead of falling off the JIT cliff.
  *
  * Bit addressing (`planes(t*bits + j)`, LSB-first shift) and the dot's
  * null handling (null elements contribute 0, length = min(|v|, dim))
  * replicate the ConstVectorDot construction EXACTLY — the DuckDB oracle
  * rebuilds these buckets from the inlined integer plane matrix, so the
  * arithmetic sequence is contract, not implementation detail. */
case class LshBucketIds(child: Expression, planes: Array[Array[Double]],
                        tables: Int, bits: Int)
    extends UnaryExpression {

  require(planes.length >= tables * bits,
    s"plane pool ${planes.length} rows < $tables x $bits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket_ids"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        if (DotKernel.dot(arr, planes(t * bits + j)) > 0) bucket |= 1 << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      // generated code calls the SAME static kernel the interpreted path
      // runs ([[DotKernel]]) — bit-identical by construction, JIT-inlined
      s"""
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if (graft.functions.DotKernel.dot($arr, $w[$t * $bits + $j]) > 0)
         |      $bucket |= (1 << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketIds =
    copy(child = newChild)
}

object LshBucketIds {
  /** Bucket ids `array<int>` (length `tables`) for `v` under the first
    * `tables*bits` rows of `planes`, addressed `t*bits + j`. */
  def lshBucketIds(v: Column, planes: Array[Array[Double]],
                   tables: Int, bits: Int): Column =
    bridge.columnOf(LshBucketIds(bridge.exprOf(v), planes, tables, bits))
}
