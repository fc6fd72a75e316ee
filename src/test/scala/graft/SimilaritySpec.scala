package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Recall checks for the ANN variants against brute-force ground truth.
  * The synthetic embeddings have weak neighbors (top-1 cosine ≈ 0.37
  * median, no planted clusters), which bounds achievable LSH recall —
  * floors below are calibrated to that, not to real-corpus behavior. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }

  lazy val exact: Map[Long, Seq[Long]] =
    topk(Similarity.topkBruteForce(spark, TestSpark.sf))

  private def recallAt5(approx: Map[Long, Seq[Long]]): Double = {
    val hits = exact.map { case (q, nbrs) =>
      approx.getOrElse(q, Seq.empty).toSet.intersect(nbrs.toSet).size.toDouble / nbrs.size
    }
    hits.sum / hits.size
  }

  test("brute force returns k neighbors per query") {
    assert(exact.nonEmpty)
    exact.foreach { case (q, nbrs) => assert(nbrs.size == 5, s"query $q") }
  }

  test("IVF recall@5 beats random-candidate baseline") {
    val r = recallAt5(topk(Similarity.topkIvf(spark, TestSpark.sf)))
    // nprobe=4 of 16 cells scans ~25% of the corpus; cell locality must
    // beat the 0.25 random baseline.
    assert(r >= 0.3, s"IVF recall@5 = $r")
  }

  test("LSH recall@5 is nonzero and prunes the corpus") {
    val lsh = topk(Similarity.topkLsh(spark, TestSpark.sf))
    val r = recallAt5(lsh)
    assert(r > 0.05, s"LSH recall@5 = $r")
  }

  test("int8 quantization: error bounded by one step, range preserved") {
    val rows = Similarity.quantizeInt8(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, err) = (r.getDouble(1), r.getDouble(2), r.getDouble(4))
      assert(hi >= lo, s"vec ${r.getLong(0)}: hi $hi < lo $lo")
      // floor-quantization puts every value within one step of its
      // reconstruction, so the mean absolute error is bounded by
      // step = (hi - lo) / 255 (plus the rounding of the reported values)
      assert(err <= (hi - lo) / 255.0 + 1e-6,
        s"vec ${r.getLong(0)}: err $err exceeds step ${(hi - lo) / 255.0}")
    }
  }

  test("corpus invariant: embeddings are fixed-width, never empty") {
    // quantization (min-max over the array) and every dot-product kernel
    // assume non-empty fixed-dim vectors; fail loudly on regeneration
    val bad = graft.Tables.embeddings(spark, TestSpark.sf)
      .where(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding")) =!= 64).count()
    assert(bad == 0L, s"$bad embeddings are not 64-dim")
  }

  test("SemDeDup cell ladder rungs are pinned (oracle CASE mirrors them)") {
    assert(operators.Similarity.semCells(200L) === 16)
    assert(operators.Similarity.semCells(2048L) === 16)
    assert(operators.Similarity.semCells(2049L) === 64)
    assert(operators.Similarity.semCells(8192L) === 64)
    assert(operators.Similarity.semCells(8193L) === 256)
    assert(operators.Similarity.semCells(32768L) === 256)
    assert(operators.Similarity.semCells(32769L) === 1024)
    // monotone: a bigger corpus never clusters into FEWER cells
    val ns = Seq(1L, 2048L, 2049L, 8193L, 32769L, 10000000L)
    assert(ns.map(operators.Similarity.semCells).sliding(2)
      .forall { case Seq(a, b) => b >= a })
  }
}
