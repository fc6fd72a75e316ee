package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `text → distinct 3-token shingles` as a native expression.
  *
  * Replaces the Scala-UDF version in the dedup hot path: a UDF pays
  * UTF8String→String→Array[String]→Catalyst-array conversion through the
  * encoder boundary per row AND breaks the whole-stage-codegen span; this
  * expression runs one static JVM call inside generated code and builds
  * the Catalyst array directly. Semantics (pinned by the DuckDB oracles):
  * split on single space KEEPING trailing empties, distinct shingles in
  * first-occurrence order, short docs (< 3 tokens) yield one short
  * shingle, null text → null.
  */
case class ShingleArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_array"

  override def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleArray.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  /** Static so generated code calls it without a captured reference. */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = math.max(toks.length - 2, 1)
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder
      val hi = math.min(i + 3, toks.length)
      var j = i
      while (j < hi) { if (j > i) sb.append(' '); sb.append(toks(j)); j += 1 }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }

  def shingleArray(c: Column): Column = bridge.columnOf(ShingleArray(bridge.exprOf(c)))
}
