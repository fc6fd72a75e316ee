package graft.tools

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[ScaleVecs]] replica-transform contract the scale corpora
  * rely on: identity at r = 0, orthogonality (within-replica norms and
  * dots preserved), and transform distinctness at arbitrary replica
  * counts (the r16 negation-cycle construction exhausted at 2·dim and
  * carried a gcd(7, dim) precondition — ADVICE r16). */
class ScaleVecsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("replica 0 is the identity") {
    assert(ScaleVecs.signArray(0).forall(_ == 1))
  }

  test("sign patterns stay distinct far past the old 2*dim family bound") {
    ScaleVecs.assertDistinct(2000) // old construction: exact twins at k > 128
  }

  test("within-replica norms and dot products are preserved exactly") {
    val s = spark; import s.implicits._
    // dyadic-rational coordinates: permutation + sign flips re-order an
    // EXACT sum, so equality below is bit-for-bit, not approximate.
    // 64-dim (the corpus dim floor): replicaTransform runtime-guards
    // dim to [64, MaxDim] (ADVICE r17), so sub-64 probes now FAIL — see
    // the guard test below.
    val a = Array.tabulate(64)(i => ((i % 9) - 4) * 0.125)
    val b = Array.tabulate(64)(i => ((i % 7) - 3) * 0.25)
    val df = Seq((0L, a), (1L, b)).toDF("id", "v")
    val dot = expr("aggregate(zip_with(x, y, (p, q) -> p * q), 0D, (acc, d) -> acc + d)")
    for (r <- Seq(1, 7, 64, 129, 500)) {
      val t = df.select($"id", ScaleVecs.replicaTransform($"v", size($"v"), r).as("x"))
      val pair = t.as("l").join(t.as("r"), $"l.id" < $"r.id")
        .select($"l.x".as("x"), $"r.x".as("y")).withColumn("d", dot).head()
      val orig = df.as("l").join(df.as("r"), $"l.id" < $"r.id")
        .select($"l.v".as("x"), $"r.v".as("y")).withColumn("d", dot).head()
      assert(pair.getDouble(2) === orig.getDouble(2), s"replica $r broke the dot product")
    }
  }

  test("transform refuses dims outside [64, MaxDim] instead of degrading") {
    val s = spark; import s.implicits._
    // ADVICE r17: past MaxDim the sign table would silently force +1 on
    // the tail coordinates; below 64 assertDistinct would validate sign
    // bits the corpus doesn't carry. Both are now loud failures.
    for (dim <- Seq(8, ScaleVecs.MaxDim + 1)) {
      val df = Seq((0L, Array.tabulate(dim)(_ * 0.125))).toDF("id", "v")
      val e = intercept[Exception] {
        df.select(ScaleVecs.replicaTransform($"v", size($"v"), 3).as("x")).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("dim outside")),
        s"dim=$dim failed with the wrong error: $e")
    }
  }

  test("distinct replicas decorrelate: transforms differ on a probe vector") {
    val s = spark; import s.implicits._
    val v = Array.tabulate(64)(i => (i + 1) * 0.015625) // 1/64 steps, exact
    val df = Seq((0L, v)).toDF("id", "v")
    val images = (0 until 200).map { r =>
      df.select(ScaleVecs.replicaTransform($"v", size($"v"), r).as("x"))
        .head().getSeq[Double](0).toVector
    }
    assert(images.distinct.size === 200, "two replicas mapped the probe identically")
  }
}
