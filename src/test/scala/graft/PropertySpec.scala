package graft

import graft.geo.Geo
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.4.3): point-in-polygon against an
  * independent winding-number implementation, tumbling/sliding window
  * coverage, and the trend predicate against a direct reference
  * implementation. Pure-Scala properties — the Spark operators these back
  * are oracle-/spec-gated elsewhere; here the underlying math is fuzzed. */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property (500 cases) and surface any failure.
    * (Raw ScalaCheck runner — scalatestplus isn't among the offline
    * deps, and this is all the integration we need.) */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  // ---------------------------------------------------------------- geometry

  /** Independent check: winding number via signed angles (sum of atan2
    * deltas ≈ ±2π inside, 0 outside). Numerically forgiving, so points
    * within eps of an edge are excluded by the generator instead. */
  private def windingContains(poly: Array[Double], x: Double, y: Double): Boolean = {
    val n = poly.length / 2
    var sum = 0.0
    var i = 0
    while (i < n) {
      val ax = poly(2 * i) - x; val ay = poly(2 * i + 1) - y
      val j = (i + 1) % n
      val bx = poly(2 * j) - x; val by = poly(2 * j + 1) - y
      sum += math.atan2(ax * by - ay * bx, ax * bx + ay * by)
      i += 1
    }
    math.abs(sum) > math.Pi // ±2π inside, ~0 outside
  }

  private def distToEdges(poly: Array[Double], x: Double, y: Double): Double = {
    val n = poly.length / 2
    (0 until n).map { i =>
      val j = (i + 1) % n
      val ax = poly(2 * i); val ay = poly(2 * i + 1)
      val bx = poly(2 * j); val by = poly(2 * j + 1)
      val dx = bx - ax; val dy = by - ay
      val t = math.max(0.0, math.min(1.0,
        ((x - ax) * dx + (y - ay) * dy) / (dx * dx + dy * dy)))
      math.hypot(x - (ax + t * dx), y - (ay + t * dy))
    }.min
  }

  test("ray casting agrees with winding number on both HQ polygons") {
    val lonGen = Gen.chooseNum(-74.020, -74.005)
    val latGen = Gen.chooseNum(40.710, 40.725)
    for (poly <- Seq(Geo.goldman, Geo.citigroup)) {
      check(forAll(lonGen, latGen) { (lon, lat) =>
        distToEdges(poly, lon, lat) < 1e-9 || // skip near-boundary points
          Geo.contains(poly, lon, lat) == windingContains(poly, lon, lat)
      })
    }
  }

  // ----------------------------------------------------------------- windows

  private val tsGen = Gen.chooseNum(0L, 7L * 24 * 3600 * 1000000L) // a week in micros

  test("every timestamp lands in exactly one tumbling window") {
    val width = 600000000L // 10 min in micros
    check(forAll(tsGen) { ts =>
      val start = math.floorDiv(ts, width) * width
      val inWindow = start <= ts && ts < start + width
      // no adjacent window also claims it
      val prevClaims = (start - width) <= ts && ts < start
      val nextClaims = (start + width) <= ts && ts < start + 2 * width
      inWindow && !prevClaims && !nextClaims
    })
  }

  test("sliding 10/5 windows: every timestamp is claimed by exactly duration/slide windows") {
    val width = 600000000L; val slide = 300000000L
    check(forAll(tsGen) { ts =>
      // windows start on the slide grid; count those containing ts
      val firstStart = math.floorDiv(ts, slide) * slide - width + slide
      val claims = Iterator.iterate(firstStart)(_ + slide)
        .takeWhile(_ <= ts)
        .count(s => s <= ts && ts < s + width)
      claims == (width / slide)
    })
  }

  // ---------------------------------------------------------------- shingles

  /** Plain-Scala reference for the native ShingleArray expression. */
  private def shinglesRef(text: String): Seq[String] = {
    val toks = text.split(" ", -1)
    val n = math.max(toks.length - 2, 1)
    (0 until n).map(i => toks.slice(i, math.min(i + 3, toks.length)).mkString(" ")).distinct
  }

  test("native ShingleArray matches the reference on arbitrary token strings") {
    val tokGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "", "d e")) // incl. empties
    check(forAll(tokGen) { toks =>
      val text = toks.mkString(" ")
      val got = graft.functions.ShingleArray
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(text))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      got == shinglesRef(text)
    })
  }

  // ------------------------------------------------------------------- trend

  /** Direct reference implementation of the Task4 doubling rule over a
    * per-window count series (`Task4.py:126-132` semantics, n >= 3 gate as
    * in EventOps.trendLag). */
  private def trendRef(counts: List[Long]): List[Int] =
    counts.zipWithIndex.drop(1).collect {
      case (n, i) if n >= 3 && n >= 2 * counts(i - 1) => i
    }

  test("lag-form trend detector matches the reference rule on generated series") {
    val seriesGen = Gen.listOfN(40, Gen.chooseNum(0L, 12L)).suchThat(_.nonEmpty)
    check(forAll(seriesGen) { counts =>
      // lag formulation: compare (prev, cur) pairs — what trendLag computes
      val viaLag = counts.sliding(2).zipWithIndex.collect {
        case (Seq(prev, cur), i) if cur >= 3 && cur >= 2 * prev => i + 1
      }.toList
      viaLag == trendRef(counts)
    })
  }
}
