package graft

import graft.functions.TopKByScore
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bounded-heap top-k aggregate to the row_number-window form it
  * replaces in the scale tooling's ground-truth computation (VERDICT r19
  * #4): same (score DESC, id ASC) total order, identical result SET on
  * data with duplicate scores, sparse groups, and groups smaller than k.
  * The aggregate's value is plan shape (partial-aggregable, no full
  * exchange of the scored stream) — the spec proves the semantics are
  * unchanged. */
class TopKByScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  test("aggregate top-5 set equals window top-5 set (seeded, with score ties)") {
    import spark.implicits._
    // 40 groups x 400 rows; scores quantized to 2 decimals so duplicate
    // scores occur and the id tie-break actually decides membership.
    // group/score from HIGH bits — an LCG's low bits alternate parity,
    // which would silently halve the group count
    val rows = lcg(42L).take(16000).grouped(2).zipWithIndex.map {
      case (Seq(a, b), i) =>
        val g = ((a >>> 20) % 40L)
        val score = ((b >>> 20) % 1000L) / 100.0
        (g, i.toLong, score)
    }.toSeq.toDF("query_id", "neighbor_id", "score")

    val top5 = TopKByScore.topK(5)
    val agg = rows.groupBy($"query_id")
      .agg(top5($"score", $"neighbor_id").as("top"))
      .select($"query_id", explode($"top.id").as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id".asc)
    val win = rows.withColumn("rnk", row_number().over(w)).where($"rnk" <= 5)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(agg == win)
    assert(agg.size == 40 * 5)
  }

  test("NaN scores rank greatest, matching the window's double DESC order (ADVICE r20)") {
    import spark.implicits._
    // a NaN cosine arises from a zero-norm vector (qnorm*nnorm = 0);
    // Spark sorts NaN as the LARGEST double, so under score DESC the
    // NaN rows must occupy the top ranks (ties on id ASC)
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 11L, Double.NaN), (1L, 12L, 0.7),
      (1L, 13L, Double.NaN), (1L, 14L, 0.5), (1L, 15L, 0.3), (1L, 16L, 0.1)
    ).toDF("query_id", "neighbor_id", "score")

    val top5 = TopKByScore.topK(5)
    val agg = rows.groupBy($"query_id")
      .agg(top5($"score", $"neighbor_id").as("top"))
      .select($"query_id", posexplode($"top.id"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq.sortBy(_._1).map(_._2)

    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id".asc)
    val win = rows.withColumn("rnk", row_number().over(w)).where($"rnk" <= 5)
      .orderBy($"rnk").select($"neighbor_id")
      .collect().map(_.getLong(0)).toSeq

    assert(agg == win)
    assert(agg == Seq(11L, 13L, 10L, 12L, 14L)) // NaN first (id ties), then DESC
  }

  test("groups smaller than k return all members, best first") {
    import spark.implicits._
    val rows = Seq((1L, 10L, 3.0), (1L, 11L, 7.0), (2L, 20L, 1.0))
      .toDF("query_id", "neighbor_id", "score")
    val top5 = TopKByScore.topK(5)
    val got = rows.groupBy($"query_id")
      .agg(top5($"score", $"neighbor_id").as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getDouble(0), e.getLong(1)))).toMap
    assert(got(1L) == Seq((7.0, 11L), (3.0, 10L)))
    assert(got(2L) == Seq((1.0, 20L)))
  }
}
