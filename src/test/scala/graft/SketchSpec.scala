package graft

import graft.operators.Sketches
import org.scalatest.funsuite.AnyFunSuite

/** Error bounds for the approximate aggregations (the oracle can't check
  * engine-specific sketches; this pins them against the exact values). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("HLL approx distinct within 5% of exact; registered flag asserts it") {
    // the registered query now emits the bound FLAG (engine-agreement
    // oracle contract); the raw estimate is re-derived here to keep the
    // direct numeric bound pinned too
    import org.apache.spark.sql.functions._
    Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect().foreach { r =>
        val exact = r.getLong(1).toDouble
        val approx = r.getLong(2).toDouble
        assert(math.abs(approx - exact) / exact <= 0.05,
          s"${r.getString(0)}: exact=$exact approx=$approx")
      }
    Sketches.approxDistinct(spark, TestSpark.sf).collect().foreach { r =>
      assert(r.getInt(2) === 1, s"${r.getString(0)}: approx_within_5pct flag not set")
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
