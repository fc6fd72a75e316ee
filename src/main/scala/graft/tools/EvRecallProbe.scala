package graft.tools

import graft.Tables
import graft.operators.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decorrelated-corpus recall probe for the E2LSH profile ladder's
  * extension rungs (VERDICT r19 #2): the ts-shift replica corpus that
  * every prior rung probe used ([[EvRungProbe]], [[CapSweep]]) carries a
  * structural defect at extension scale — `hour(ts)` has period 24, so
  * replicas r and r+24 apply the SAME profile rotation and every
  * rotation-invariant-ish user acquires exact/near distance-0 twins
  * across replicas. The global top-20 ground truth degenerates to those
  * twins (recall 1.0 trivially, "model-predicted only" past 150k users),
  * and the near-twin classes inflate candidate counts with collisions no
  * realistic corpus would produce.
  *
  * This probe builds a corpus where BOTH measurements are honest, via a
  * per-replica TRANSLATION in profile space on top of the rotation:
  *
  *   - Profiles are `round(sum(value), 2)` per (user, hour)
  *     ([[EventOps.profileVecs]]), so appending ONE synthetic event per
  *     (replica, user, hour) with `value = delta_r(h)` translates every
  *     profile of replica r by exactly the same vector delta_r.
  *     Translation is an isometry of Euclidean distance: WITHIN a
  *     replica, every pair distance equals the base corpus's —
  *     each replica poses the base similarity problem verbatim
  *     (the [[ScaleVecs]] orthogonal-transform discipline, realized in
  *     event space where an arbitrary orthogonal map is unavailable).
  *   - ACROSS replicas, profiles separate by ||delta_r - delta_s|| plus
  *     the profile difference. delta coords are deterministic splitmix64
  *     draws in [0, DeltaMax]; with DeltaMax = 200 the typical
  *     separation is ~2·DeltaMax = 400, placing cross-replica pairs in
  *     the base corpus's own far-pair bulk (sf0.1 pair-distance median
  *     ~793, p25 ~703 — measured r20) instead of at distance 0: the
  *     corpus grows like K independent copies of the same problem, and
  *     candidate volume reflects realistic far-pair collision rates.
  *
  * GROUND TRUTH is planted and per-pair-exact UP TO PROFILE ROUNDING
  * (ADVICE r20, low): the integer delta is added inside profileVecs'
  * round(sum(value), 2), so FP accumulation order plus half-way
  * rounding of S+delta vs S can perturb a coordinate by at most 0.01 —
  * within-replica pair distances match the base distances to that
  * epsilon rather than bit-exactly, and top-20 membership could in
  * principle shift at an exact distance tie (none observed at the
  * measured rungs; base top-20 distances are separated by >> 0.01).
  * The base corpus's brute top-20 pairs
  * ([[EventOps.tsSimilarityBrute]], distances 276-330 at
  * sf0.1) recur once per replica at those base distances. Each of
  * the K copies is an independent amplification trial of the rung —
  * recall over the K·20 planted pairs measures
  * 1-(1-p1^pk)^pt at the top-20 distance scale directly, with ~K trials
  * per base pair (tight binomials at K >= 300). This is the quantity the
  * 0.74 closed-form floor predicts for the extension rungs; the
  * measurement includes the shipped hot-bucket cap.
  *
  * The end-to-end registered query ([[EventOps.tsSimilarity]]) is also
  * run and its top-20 overlap with planted pairs reported — informational
  * (a cross-replica pair under the planted band is improbable but not
  * analytically excluded, so the exact global truth claim stays with the
  * candidate-recall metric).
  *
  * Env:
  *   SPARK_GRAFT_EV_RECALL_K     replica count (default 300 -> 450k users)
  *   SPARK_GRAFT_EV_RECALL_RUNG  "pt,pk" rung override (trim sweeps)
  *   SPARK_GRAFT_EV_RECALL_REUSE reuse an existing corpus dir
  *
  * Run: SPARK_GRAFT_EV_RECALL_K=300 sbt "runMain graft.tools.EvRecallProbe"
  */
object EvRecallProbe {

  /** splitmix64 (public domain, Steele et al. 2014) — same mixer as
    * [[ScaleVecs]]; duplicated at 4 lines rather than widening that
    * object's private API. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-replica translation vector: 24 deterministic draws in
    * [0, DeltaMax]; replica 0 is the identity (delta = 0) so the base
    * corpus embeds verbatim. */
  private val DeltaMax = 200L
  private[tools] def delta(r: Int): Array[Long] =
    if (r == 0) Array.fill(24)(0L)
    else Array.tabulate(24) { h =>
      java.lang.Long.remainderUnsigned(mix64(r.toLong * 24 + h), DeltaMax + 1)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)

    val k = sys.env.getOrElse("SPARK_GRAFT_EV_RECALL_K", "300").toInt
    val dir = s"/tmp/ev_decor/ev_x$k"

    // Driver-side separation audit over all C(k,2) delta pairs (k <= ~1k
    // -> <=500k 24-dim distances, milliseconds): distinctness is REQUIRED
    // (equal deltas would re-plant cross-replica twins, the exact disease
    // this corpus removes); the min/typical separations are printed so
    // the cross-pair distance regime is on the record.
    val ds = (0 until k).map(delta)
    var minSep = Double.MaxValue
    var sumSep = 0.0
    var nSep = 0L
    for (r <- 0 until k; s <- (r + 1) until k) {
      var acc = 0.0
      var h = 0
      while (h < 24) { val d = (ds(r)(h) - ds(s)(h)).toDouble; acc += d * d; h += 1 }
      val sep = math.sqrt(acc)
      if (sep < minSep) minSep = sep
      sumSep += sep; nSep += 1
    }
    require(minSep > 0.0, "replica deltas collide — corpus would plant cross-replica twins")

    val ev = Tables.events(spark, sfDir)
    if (!(sys.env.contains("SPARK_GRAFT_EV_RECALL_REUSE") &&
          new java.io.File(s"$dir/events.parquet/_SUCCESS").exists())) {
      // (r, h, dv) is 24k rows at k=1000 — broadcast onto users x hours.
      val deltaDf = (0 until k).flatMap { r =>
        val d = delta(r); (0 until 24).map(h => (r, h, d(h).toDouble))
      }.toDF("r", "h", "dv")
      val users = ev.select($"user_id").distinct()
      val synth = users.crossJoin(broadcast(deltaDf))
        .select(
          // ids far above the real range; uniqueness is irrelevant to
          // profileVecs but keeps the table well-formed
          (lit(900000000000L) + $"r" * 100000L * 24L + $"user_id" * 24L + $"h").as("event_id"),
          expr("timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,h)").as("ts"),
          ($"user_id" + $"r".cast("long") * 10000000L).as("user_id"),
          lit("decor").as("event_type"),
          $"dv".as("value"))
      val replicas = (0 until k).map { r =>
        ev.select($"event_id",
          ($"ts" + expr(s"INTERVAL $r HOURS")).as("ts"),
          ($"user_id" + lit(r.toLong * 10000000L)).as("user_id"),
          $"event_type", $"value")
      }.reduce(_ unionByName _)
      replicas.unionByName(synth)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } else System.err.println(s"[ev-recall] reusing corpus at $dir")

    // Planted truth: the base corpus's brute top-20 (exact), replicated.
    val basePairs = EventOps.tsSimilarityBrute(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = basePairs.zipWithIndex.flatMap { case ((ua, ub, d), i) =>
      (0 until k).map(r =>
        (ua + r.toLong * 10000000L, ub + r.toLong * 10000000L, i, d))
    }.toSeq.toDF("user_a", "user_b", "base_pair", "base_dist")

    val vecs = EventOps.profileVecs(spark, dir).persist()
    val nUsers = vecs.count()
    val (pt, pk) = sys.env.get("SPARK_GRAFT_EV_RECALL_RUNG")
      .map { s => val a = s.split(","); (a(0).trim.toInt, a(1).trim.toInt) }
      .getOrElse(EventOps.profParams(nUsers))
    val cap = EventOps.profCap(nUsers)

    // Candidate volume (HLL over the pre-distinct stream — the
    // EvRungProbe r19 shape, no pair-stream shuffle) ...
    val raw = EventOps.tsCandidates(vecs, pt, pk, cap = cap, dedup = false)
    val t0 = System.nanoTime()
    val row = raw.agg(
      approx_count_distinct(struct($"user_a", $"user_b"), 0.005),
      count(lit(1))).head()
    val (cands, rawPairs) = (row.getLong(0), row.getLong(1))
    val candSec = (System.nanoTime() - t0) / 1e9

    // ... and planted-pair recall: semi-join the pre-distinct stream to
    // the k·20-row planted set FIRST (broadcast), so the distinct runs on
    // <= k·20 rows — the probe never materializes the full pair set.
    val found = EventOps.tsCandidates(vecs, pt, pk, cap = cap, dedup = false)
      .join(broadcast(expected.select($"user_a", $"user_b")), Seq("user_a", "user_b"), "leftsemi")
      .distinct()
    val perPair = found
      .join(broadcast(expected), Seq("user_a", "user_b"))
      .groupBy($"base_pair").agg(count(lit(1)).as("hits"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val totalHits = perPair.values.sum
    val recall = totalHits.toDouble / (basePairs.length.toLong * k)
    val perPairStr = basePairs.indices.map { i =>
      s"""{"pair":$i,"dist":${r3(basePairs(i)._3)},"hits":${perPair.getOrElse(i, 0L)}}"""
    }.mkString("[", ",", "]")

    // End-to-end registered shape at this rung (informational overlap).
    val t1 = System.nanoTime()
    val top = EventOps.tsTopPairs(spark, dir, None,
      rungOverride = Some((pt, pk))).collect()
    val fullSec = (System.nanoTime() - t1) / 1e9
    val topPlanted = {
      val exp = basePairs.flatMap { case (ua, ub, _) =>
        (0 until k).map(r => (ua + r.toLong * 10000000L, ub + r.toLong * 10000000L))
      }.toSet
      top.count(r => exp.contains((r.getLong(0), r.getLong(1))))
    }
    val allPairs = nUsers * (nUsers - 1) / 2
    spark.catalog.clearCache()
    println(s"""{"probe":"ev_recall","k":$k,"users":$nUsers,"pk":$pk,"pt":$pt,"cap":${cap.getOrElse(-1L)},"delta_max":$DeltaMax,"delta_sep_min":${r3(minSep)},"delta_sep_mean":${r3(sumSep / nSep)},"candidates":$cands,"raw_pairs":$rawPairs,"cands_per_user":${r3(cands.toDouble / nUsers)},"selectivity":${"%.6f".format(cands.toDouble / allPairs)},"planted":${basePairs.length * k},"planted_hit":$totalHits,"recall":${r3(recall)},"per_pair":$perPairStr,"top20_planted":$topPlanted,"top20_dist_min":${r3(top.map(_.getDouble(2)).min)},"top20_dist_max":${r3(top.map(_.getDouble(2)).max)},"cand_sec":${r3(candSec)},"full_sec":${r3(fullSec)}}""")
    spark.stop()
  }
}
