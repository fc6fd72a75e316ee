package graft

import graft.geo.Geo
import graft.functions.PointInPolygon
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the ray-casting geometry core and its Catalyst
  * expression form. Ground truth: shapely-strict `contains` semantics
  * (boundary and vertices are OUTSIDE) — SURVEY.md §2.4 U1. */
class GeoSpec extends AnyFunSuite {

  // Unit square for readable cases.
  private val square = Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0)

  test("interior / exterior / boundary on unit square") {
    assert(Geo.contains(square, 0.5, 0.5))
    assert(!Geo.contains(square, 1.5, 0.5))
    assert(!Geo.contains(square, -0.1, 0.5))
    // vertices are outside (strict interior)
    assert(!Geo.contains(square, 0.0, 0.0))
    assert(!Geo.contains(square, 1.0, 1.0))
  }

  test("HQ polygons: centroid inside, far point outside") {
    def centroid(p: Array[Double]): (Double, Double) = {
      val n = p.length / 2
      ((0 until n).map(i => p(2 * i)).sum / n,
       (0 until n).map(i => p(2 * i + 1)).sum / n)
    }
    val (gx, gy) = centroid(Geo.goldman)
    val (cx, cy) = centroid(Geo.citigroup)
    assert(Geo.contains(Geo.goldman, gx, gy))
    assert(Geo.contains(Geo.citigroup, cx, cy))
    assert(!Geo.contains(Geo.goldman, cx, cy))
    assert(!Geo.contains(Geo.citigroup, gx, gy))
    assert(Geo.classify(gx, gy) == "goldman")
    assert(Geo.classify(cx, cy) == "citigroup")
    assert(Geo.classify(0.0, 0.0) == "none")
  }

  test("PointInPolygon expression agrees with Geo.contains under forced codegen") {
    val spark = TestSpark.spark
    import spark.implicits._
    // codegen.fallback=false in TestSpark: a doGenCode bug would throw
    // instead of silently falling back to interpreted eval.
    val pts = Seq((0.5, 0.5), (1.5, 0.5), (0.0, 0.0), (0.25, 0.99))
    val df = pts.toDF("x", "y")
      .withColumn("in_sq", PointInPolygon.pointInPolygon($"x", $"y", square))
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2)))
    got.foreach { case (x, y, b) => assert(b == Geo.contains(square, x, y), s"($x,$y)") }
  }

  test("classifyHq expression: 3-way precedence") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((-74.0140575, 40.7146), (-74.010990, 40.720880), (0.0, 0.0))
      .toDF("lon", "lat")
      .withColumn("hq", PointInPolygon.classifyHq($"lon", $"lat"))
    assert(df.collect().map(_.getString(2)).toSeq == Seq("goldman", "citigroup", "none"))
  }
}
