package graft

import graft.plans.{FoldPointInPolygon, GraftExtensions, GraftFunctions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("SQL functions: vector_dot and classify_hq usable from spark.sql") {
    GraftFunctions.register(spark)
    val dot = spark.sql("SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
    val hq = spark.sql(
      "SELECT classify_hq(-74.0140575d, 40.7146d), classify_hq(0.0d, 0.0d)")
      .collect().head
    assert(hq.getString(0) == "goldman" && hq.getString(1) == "none")
  }

  test("FoldPointInPolygon erases constant classifications from the plan") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FoldPointInPolygon
    try {
      val df = spark.range(1)
        .withColumn("in_g", graft.functions.PointInPolygon.pointInPolygon(
          lit(-74.0140575), lit(40.7146), graft.geo.Geo.goldman))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("point_in_polygon"), optimized)
      assert(optimized.contains("true"), optimized)
      assert(df.collect().head.getBoolean(1))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FoldPointInPolygon)
    }
  }

  test("GraftExtensions wires rule + functions into a builder extension") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e) // must register without throwing
  }

  test("asof strategy reaches sessions through experimental strategies") {
    graft.plans.Asof.ensureStrategy(spark)
    assert(spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
    graft.plans.Asof.ensureStrategy(spark) // idempotent
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.AsofJoinStrategy) === 1)
    // and shingle_array is on the SQL surface alongside the others
    GraftFunctions.register(spark)
    val n = spark.sql("SELECT size(shingle_array('a b c d')) AS n")
      .collect().head.getInt(0)
    assert(n === 2) // "a b c", "b c d"
  }
}
