package graft.geo

/** Pure-Scala planar point-in-polygon (even-odd ray casting), strict
  * interior — matches shapely's `Polygon.contains(Point)` semantics used by
  * the reference's classify UDF (`/root/reference/Task3.py:57-61`,
  * `Task4.py:67-70`): boundary points are OUTSIDE.
  *
  * Polygons are flat `Array[Double]` of (lon, lat) pairs — cheap to embed
  * as a codegen reference object (see
  * [[graft.functions.PointInPolygon]]) and to broadcast.
  */
object Geo {

  /** Headquarters quads from the reference (`Task3.py:45-46`,
    * `Task4.py:55-56`), [lon, lat] vertex order. Both are convex and
    * clockwise-wound (verified numerically in SURVEY §5.3 prep). */
  val goldman: Array[Double] = Array(
    -74.0141012, 40.7152191,
    -74.013777,  40.7152275,
    -74.0141027, 40.7138745,
    -74.0144185, 40.7140753)

  val citigroup: Array[Double] = Array(
    -74.011869, 40.7217236,
    -74.009867, 40.721493,
    -74.010140, 40.720053,
    -74.012083, 40.720267)

  /** Even-odd ray casting (horizontal ray toward +x) with an explicit
    * on-boundary rejection, so points exactly on an edge or vertex (in
    * double arithmetic) are OUTSIDE — shapely's strict `contains`.
    * O(#vertices) per call, allocation-free. */
  def contains(poly: Array[Double], x: Double, y: Double): Boolean = {
    var inside = false
    val n = poly.length / 2
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = poly(2 * i); val yi = poly(2 * i + 1)
      val xj = poly(2 * j); val yj = poly(2 * j + 1)
      // exact-collinear AND within the edge's bounding box → boundary
      if ((xj - xi) * (y - yi) - (yj - yi) * (x - xi) == 0.0 &&
          math.min(xi, xj) <= x && x <= math.max(xi, xj) &&
          math.min(yi, yj) <= y && y <= math.max(yi, yj)) {
        return false
      }
      if ((yi > y) != (yj > y) &&
          x < (xj - xi) * (y - yi) / (yj - yi) + xi) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** The reference's 3-way classification (`Task3.py:57-73`): goldman
    * wins ties by being tested first. */
  def classify(lon: Double, lat: Double): String =
    if (contains(goldman, lon, lat)) "goldman"
    else if (contains(citigroup, lon, lat)) "citigroup"
    else "none"
}
