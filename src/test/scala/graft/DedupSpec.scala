package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of the approximate dedup operators against the exact
  * n-gram Jaccard computation (which is itself DuckDB-oracle-checked). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exactPairs: Set[(Long, Long)] =
    pairs(Dedup.ngramJaccard(spark, TestSpark.sf))

  test("exact jaccard finds the planted near-dups") {
    assert(exactPairs.nonEmpty)
  }

  test("minhash+LSH output equals exact jaccard output") {
    // Candidate generation is approximate but the exact-jaccard verify
    // makes false positives impossible; this asserts no false negatives
    // on this dataset either (8 bands × 4 rows vs j ≈ 0.9 planted pairs).
    assert(pairs(Dedup.minhashLsh(spark, TestSpark.sf)) == exactPairs)
  }

  test("simhash pairs are a subset of jaccard near-dups (≥ 0.5)") {
    val sim = pairs(Dedup.simhash(spark, TestSpark.sf))
    assert(sim.nonEmpty, "simhash found nothing")
    // hamming ≤ 3 on 64-bit shingle simhash is a stricter filter than
    // jaccard ≥ 0.8 on this corpus; allow it to miss pairs but not to
    // invent pairs that exact jaccard rejects.
    val invented = sim -- exactPairs
    assert(invented.isEmpty, s"simhash invented non-dup pairs: $invented")
  }
}
