package graft

import graft.operators.{EventOps, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Hot-bucket postings cap (round 14): deterministic truncation of the
  * skew tail in the LSH candidate joins — [[Similarity.capPostings]] and
  * its ladder activation rules. Correctness of the CAPPED end-to-end
  * results against DuckDB is covered by the oracle gate run at a
  * cap-active corpus size (BASELINE.md records the /tmp/graft_sf1
  * check); this spec pins the mechanism itself. */
class PostingsCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cap ladder activates only above the anchor thresholds") {
    // every driver SF sits below both anchors → gated hashes never see a cap
    assert(Similarity.lshPostingsCap(2000L, 6).isEmpty)
    assert(Similarity.lshPostingsCap(8191L, 8).isEmpty)
    assert(EventOps.profCap(1500L).isEmpty)
    assert(EventOps.profCap(4999L).isEmpty)
    // active: mult × max(1, n >> bits), the oracle CTE's exact arithmetic
    assert(Similarity.lshPostingsCap(8192L, 8).contains(16L * (8192L >> 8)))
    assert(Similarity.lshPostingsCap(40000L, 10).contains(16L * (40000L >> 10)))
    assert(EventOps.profCap(5000L).contains(400L))
  }

  test("capPostings keeps the knuth-hash-ranked prefix per bucket, deterministically") {
    val s = spark; import s.implicits._
    // one hot bucket (ids 0..9), one cold (ids 100..101)
    val buckets = ((0L to 9L).map(id => (id, 0, 7L)) ++
      Seq((100L, 1, 7L), (101L, 1, 7L))).toDF("vec_id", "tbl", "bucket")
    val capped = Similarity.capPostings(buckets, Some(4L))
      .collect().map(r => (r.getInt(1), r.getLong(0))).groupBy(_._1)
    // cold bucket untouched
    assert(capped(1).map(_._2).sorted.toSeq == Seq(100L, 101L))
    // hot bucket truncated to exactly 4, by knuth rank (not raw id order)
    val expected = (0L to 9L).sortBy(id => (id % 1000003L * 2654435761L % 1000003L, id)).take(4)
    assert(capped(0).map(_._2).toSet == expected.toSet)
    assert(expected.toSet != (0L to 3L).toSet,
      "test vector too weak: knuth order coincides with id order")
    // None ⇒ identity
    assert(Similarity.capPostings(buckets, None).count() == 12)
  }

  test("capped corpus candidates are a subset of uncapped, query side unaffected") {
    val dir = TestSpark.sf // 500 vectors — below the anchor, so force a cap
    val e = Similarity.vecs(spark, dir)
    val buckets = Similarity.lshBuckets(e).persist()
    val uncapped = Similarity.lshCandidates(e, buckets, buckets)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Similarity.lshCandidates(e, buckets,
        Similarity.capPostings(buckets, Some(3L)))
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size, "cap=3 should truncate something at 500 vectors")
    // every query still produces candidates: its own bucket keys are
    // derived from the UNCAPPED relation (a capped-away query posting
    // must not silence the query itself)
    assert(capped.map(_._1) == uncapped.map(_._1), "cap must not drop whole queries")
    buckets.unpersist()
  }
}
