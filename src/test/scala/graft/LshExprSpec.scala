package graft

import graft.functions.{ConstVectorDot, E2lshKeys, LshBucketIds}
import graft.functions.ConstVectorDot.dotConst
import graft.functions.E2lshKeys.e2lshKeys
import graft.functions.LshBucketIds.lshBucketIds
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r13 single-expression signature kernels claim BIT-IDENTICAL
  * output to the per-plane [[ConstVectorDot]] compositions they replaced
  * (the DuckDB oracles rebuild signatures from the same arithmetic, so
  * equivalence is a correctness contract, not an optimization detail).
  * This spec pins it on both execution paths: the codegen'd DataFrame
  * plan (TestSpark sets codegen.fallback=false, so doGenCode runs) and
  * the interpreted `nullSafeEval` used by non-codegen contexts. */
class LshExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // deterministic synthetic plane pool — equivalence must hold for ANY
  // matrix, so the test needs no access to the production pool
  private val dim = 16
  private val planes: Array[Array[Double]] =
    Array.tabulate(48)(h => Array.tabulate(dim)(d => ((h * 31 + d * 7) % 19 - 9) / 10.0))

  private def vecDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 64).map(_ => Array.fill(dim)(rnd.nextGaussian()))
    rows.toDF("v")
      // edge cases: shorter and longer than the plane dim (dot runs over
      // min(|v|, dim)), an all-zero vector (dot == 0 is NOT > 0: bit
      // stays clear), and a null element (contributes 0)
      .union(Seq(Array.fill(dim / 2)(0.5), Array.fill(dim * 2)(-0.25),
                 Array.fill(dim)(0.0)).toDF("v"))
      .union(spark.sql("SELECT array(1.0, cast(null as double), 2.0) AS v"))
  }

  test("LshBucketIds == per-plane dotConst sign composition (codegen path)") {
    val (tables, bits) = (6, 8)
    val df = vecDf
    val composed = {
      val withBits = df.withColumn("bits",
        array((0 until tables * bits).map(h => (dotConst(col("v"), planes(h)) > 0).cast("int")): _*))
      withBits.select(array((0 until tables).map { t =>
        (0 until bits).map(j => element_at(col("bits"), t * bits + j + 1) * lit(1 << j))
          .reduce(_ + _)
      }: _*).as("bks"))
    }
    val native = df.select(lshBucketIds(col("v"), planes, tables, bits).as("bks"))
    val a = composed.collect().map(_.getSeq[Int](0))
    val b = native.collect().map(_.getSeq[Int](0))
    assert(a.length === b.length)
    a.lazyZip(b).foreach { (x, y) => assert(x === y) }
  }

  test("E2lshKeys == per-projection floor(dotConst/w) composition (codegen path)") {
    val w = 0.37
    val df = vecDf
    val composed = df.select(array((0 until planes.length).map(h =>
      floor(dotConst(col("v"), planes(h)) / w).cast("long")): _*).as("q"))
    val native = df.select(e2lshKeys(col("v"), planes, w).as("q"))
    val a = composed.collect().map(_.getSeq[Long](0))
    val b = native.collect().map(_.getSeq[Long](0))
    a.lazyZip(b).foreach { (x, y) => assert(x === y) }
  }

  test("interpreted nullSafeEval matches the codegen'd plan output") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    val df = vecDf
    val fromPlan = df.select(lshBucketIds(col("v"), planes, 6, 8).as("bks"),
                             e2lshKeys(col("v"), planes, 0.37).as("q"),
                             col("v")).collect()
    fromPlan.foreach { r =>
      val v = r.getSeq[java.lang.Double](2).toArray[Any]
      val arr: ArrayData = new GenericArrayData(v)
      val viaEval = LshBucketIds(null, planes, 6, 8)
        .nullSafeEval(arr).asInstanceOf[ArrayData].toIntArray.toSeq
      assert(viaEval === r.getSeq[Int](0))
      val viaEval2 = E2lshKeys(null, planes, 0.37)
        .nullSafeEval(arr).asInstanceOf[ArrayData].toLongArray.toSeq
      assert(viaEval2 === r.getSeq[Long](1))
    }
  }
}
