package graft.tools

import graft.operators.{EventOps, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration sweep for the round-14 hot-bucket postings caps — the
  * measurement behind the shipped [[EventOps.ProfCap]] /
  * [[Similarity.LshCapMult]] constants (the same role tune_e2lsh.py /
  * pq_sweep.py played for the r10 grids; BASELINE.md records the chosen
  * row). For each candidate cap it reports, at a corpus size where the
  * cap is ACTIVE:
  *
  *   - the bucket-size tail (max / p99 postings per bucket) the cap cuts,
  *   - candidate-pair volume vs the uncapped run,
  *   - recall vs the exact brute-force twin (the contract floor:
  *     ts_similarity >= 0.80 at the K=10 corpus, multiprobe >= 0.55),
  *   - wall-clock of the full registered query shape.
  *
  * Corpora are built here with the SAME isomorphic-replica construction
  * as SimilarityScaleBench (ts-shift for events, rotation×negation for
  * embeddings) — MakeScale's event replicas do NOT shift timestamps, so
  * its cross-replica profile pairs are exact duplicates and recall
  * against the brute twin reads a meaningless 1.0 there.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.CapSweep"
  */
object CapSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)

    // ---- bench-identical replica corpora (SimilarityScaleBench 2a/2b)
    val evK = sys.env.getOrElse("SPARK_GRAFT_SWEEP_EVK", "10").toInt
    val embK = sys.env.getOrElse("SPARK_GRAFT_SWEEP_EMBK", "20").toInt
    val dir = s"/tmp/cap_sweep/ev_x$evK"
    val ev = graft.Tables.events(spark, sfDir)
    (0 until evK).map { r =>
      ev.select($"event_id",
        ($"ts" + expr(s"INTERVAL $r HOURS")).as("ts"),
        ($"user_id" + lit(r.toLong * 10000000L)).as("user_id"),
        $"event_type", $"value")
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val edir = s"/tmp/cap_sweep/emb_x$embK"
    val embBase = graft.Tables.embeddings(spark, sfDir)
    (0 until embK).map { r =>
      val rot = r % 64
      val rotated =
        if (rot == 0) $"embedding"
        else concat(slice($"embedding", rot + 1, 64 - rot), slice($"embedding", 1, rot))
      embBase.select(
        ($"vec_id" + lit(r.toLong * 10000000L)).as("vec_id"),
        (if (r < 64) rotated else transform(rotated, x => -x)).as("embedding"),
        $"label")
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$edir/embeddings.parquet")

    // ---- E2LSH rung sweep (round 14, sf10-probe follow-up): when
    // SPARK_GRAFT_SWEEP_TS_RUNGS="8x53:400,9x64:400,…" is set, sweep
    // (pk, pt, cap) LADDER CANDIDATES at the EVK corpus instead of the
    // cap sweep — the measurement behind any rung added above the shipped
    // ProfSteps top. Brute ground truth runs ONCE (global top-20 over
    // C(n,2) pairs — minutes at 150k users, the one-off price of a real
    // recall number at the probed decade).
    sys.env.get("SPARK_GRAFT_SWEEP_TS_RUNGS").foreach { spec =>
      val vecs = EventOps.profileVecs(spark, dir).persist()
      val users = vecs.count()
      var t0 = System.nanoTime()
      val brute = EventOps.tsSimilarityBrute(spark, dir)
        .select("user_a", "user_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"""{"sweep":"ts_rung","users":$users,"brute_sec":${r3((System.nanoTime() - t0) / 1e9)}}""")
      spec.split(",").foreach { cfg =>
        val Array(rung, capS) = cfg.split(":")
        val Array(pkS, ptS) = rung.split("x")
        val (pk, pt, cap) = (pkS.toInt, ptS.toInt, capS.toLong)
        t0 = System.nanoTime()
        val cands = EventOps.tsCandidates(vecs, pt, pk, cap = Some(cap)).count()
        val candSec = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val top = EventOps.tsTopPairs(spark, dir, Some(Some(cap)), Some((pt, pk)))
          .select("user_a", "user_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val fullSec = (System.nanoTime() - t0) / 1e9
        val rec = top.intersect(brute).size.toDouble / brute.size
        println(s"""{"sweep":"ts_rung","pk":$pk,"pt":$pt,"cap":$cap,"candidates":$cands,"cands_per_user":${r3(cands.toDouble / users)},"recall":${r3(rec)},"cand_sec":${r3(candSec)},"full_sec":${r3(fullSec)}}""")
      }
      spark.stop()
      return
    }

    // ---- E2LSH profile pairs: bucket tail + cap sweep
    val vecs = EventOps.profileVecs(spark, dir).persist()
    val users = vecs.count()
    val (pt, pk) = EventOps.profParams(users)
    println(s"""{"sweep":"e2lsh","users":$users,"pt":$pt,"pk":$pk}""")
    val brute = EventOps.tsSimilarityBrute(spark, dir)
      .select("user_a", "user_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // warm the candidate pipeline's codegen so the first cap row isn't
    // charged the JIT/compile cost the others skip
    EventOps.tsCandidates(vecs, pt, pk, cap = Some(50L)).count()
    Seq[Option[Long]](None, Some(800L), Some(400L), Some(200L), Some(100L), Some(50L)).foreach { cap =>
      val t0 = System.nanoTime()
      val cands = EventOps.tsCandidates(vecs, pt, pk, cap = cap).count()
      val top = EventOps.tsTopPairs(spark, dir, Some(cap))
        .select("user_a", "user_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val rec = top.intersect(brute).size.toDouble / brute.size
      println(s"""{"sweep":"e2lsh","cap":${cap.getOrElse(-1L)},"candidates":$cands,"recall":${r3(rec)},"sec":${r3(sec)}}""")
    }
    spark.catalog.clearCache()

    // ---- sign-LSH ANN: bucket tail + cap-mult sweep
    val e = Similarity.vecs(spark, edir)
    val n = e.count()
    val (lt, lb) = Similarity.lshParams(n)
    val buckets = Similarity.lshBuckets(e, tables = lt, bits = lb).persist()
    val tail = buckets.groupBy($"tbl", $"bucket").agg(count(lit(1)).as("m"))
      .agg(max($"m").as("mx"), expr("approx_percentile(m, 0.99)").as("p99"),
           avg($"m").as("mean")).head()
    println(s"""{"sweep":"signlsh","vectors":$n,"tables":$lt,"bits":$lb,"bucket_max":${tail.getLong(0)},"bucket_p99":${tail.getLong(1)},"bucket_mean":${r3(tail.getDouble(2))}}""")
    val bf = Similarity.topkBruteForce(spark, edir)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nq = e.where($"vec_id" % 50 === 0).count()
    Seq[Option[Long]](None, Some(16L), Some(12L), Some(8L), Some(6L), Some(4L)).foreach { mult =>
      val cap = mult.map(m => m * math.max(1L, n >> lb))
      val corpus = Similarity.capPostings(buckets, cap)
      val t0 = System.nanoTime()
      val cands = Similarity.lshCandidates(e, buckets, corpus).count()
      val qE = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
      val single = Similarity.rankTopK(Similarity.lshCandidates(e, buckets, corpus), e, qE)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val qb = buckets.join(qE, $"vec_id" === $"query_id")
        .select($"query_id", $"qv", $"qnorm", $"tbl", $"bucket")
      val multi = Similarity.rankTopK(
          Similarity.multiprobeCandidates(qb, corpus, bits = lb), e, qE)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"sweep":"signlsh","cap_mult":${mult.getOrElse(-1L)},"cap":${cap.getOrElse(-1L)},"cands":$cands,"cands_per_query":${r3(cands.toDouble / nq)},"recall_lsh":${r3(single.intersect(bf).size.toDouble / bf.size)},"recall_multiprobe":${r3(multi.intersect(bf).size.toDouble / bf.size)},"sec":${r3(sec)}}""")
    }
    spark.stop()
  }
}
