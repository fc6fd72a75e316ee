package graft

import graft.operators.Sketches
import org.scalatest.funsuite.AnyFunSuite

/** Error bounds for the approximate aggregations (the oracle can't check
  * engine-specific sketches; this pins them against the exact values). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("HLL approx distinct within 5% of exact") {
    Sketches.approxDistinct(spark, TestSpark.sf).collect().foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("percentile_approx tracks exact percentile within 5% of the p50") {
    import org.apache.spark.sql.functions._
    val df = Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("exact"),
           expr("percentile_approx(value, 0.5, 1000)").as("approx"))
    df.collect().foreach { r =>
      val e = r.getDouble(1); val a = r.getDouble(2)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }
}
