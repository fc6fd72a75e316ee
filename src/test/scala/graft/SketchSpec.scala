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

  test("count-min estimates are one-sided: cms_n >= exact_n, within CMS error bound") {
    val rows = Sketches.cmsFreq(spark, TestSpark.sf).collect()
    assert(rows.length === 10)
    val total = Tables.events(spark, TestSpark.sf).count().toDouble
    rows.foreach { r =>
      val exact = r.getLong(1); val cms = r.getLong(2)
      assert(cms >= exact, s"user ${r.getLong(0)}: CMS undercounted ($cms < $exact)")
      // standard CMS guarantee: overcount <= e/w * total with prob 1-1/2^d;
      // generous 2x slack keeps the assert stable across SFs
      assert(cms - exact <= 2 * math.E / 64 * total + 1,
        s"user ${r.getLong(0)}: overcount ${cms - exact} beyond bound")
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
