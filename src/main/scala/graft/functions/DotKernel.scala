package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** THE null-tolerant constant-weight dot kernel — single source of truth
  * for the inner loop that [[ConstVectorDot]], [[LshBucketIds]] and
  * [[E2lshKeys]] all document as oracle contract: length = min(|v|, |w|),
  * null elements contribute 0, strict left-to-right accumulation.
  *
  * Both execution paths call THIS method: interpreted `nullSafeEval`s
  * directly, and generated code via the static forwarder
  * (`graft.functions.DotKernel.dot(...)` — JIT inlines the hot call, so
  * the generated loop bodies stay constant-size AND bit-identical to the
  * interpreted path by construction). A change to the contract lands in
  * one place instead of six hand-kept copies. */
object DotKernel {
  def dot(arr: ArrayData, w: Array[Double]): Double = {
    val n = math.min(arr.numElements(), w.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc += arr.getDouble(i) * w(i)
      i += 1
    }
    acc
  }
}
