package graft.tools

import graft.Tables
import graft.operators.EventOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-volume probe for the E2LSH profile ladder's r17 closed-form
  * extension rungs (VERDICT r16 #7): builds a ts-shifted replica corpus
  * of K × the sf0.1 events (the CapSweep construction — profile
  * geometry preserved per replica, bucket hashes decorrelated), and
  * measures, at the rung [[EventOps.profParams]] picks:
  *
  *   - candidates/user and selectivity vs C(n,2) — the
  *     reversion-to-linear check (the 150k-user incident's signature was
  *     candidates/user jumping ~4.2×/decade at a stale top rung);
  *   - the full registered-shape `tsSimilarity` wall.
  *
  * RECALL at these sizes is NOT measured here: the contract is a GLOBAL
  * top-20 over C(n,2) pairs, and the exact brute twin is ~5×10¹¹
  * distance evaluations at 1M users — the extension rungs' recall is to
  * be calibrated by the CapSweep TS_RUNGS sweep at the largest
  * brute-feasible size (~150k users, done r14) plus the analytic
  * within-replica construction when a rung is promoted from predicted
  * to measured (BASELINE.md, E2LSH extension note).
  *
  * Run: SPARK_GRAFT_EV_RUNG_K=667 sbt "runMain graft.tools.EvRungProbe"
  */
object EvRungProbe {
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

    val k = sys.env.getOrElse("SPARK_GRAFT_EV_RUNG_K", "667").toInt
    val dir = s"/tmp/ev_rung/ev_x$k"
    val ev = Tables.events(spark, sfDir)
    (0 until k).map { r =>
      ev.select($"event_id",
        ($"ts" + expr(s"INTERVAL $r HOURS")).as("ts"),
        ($"user_id" + lit(r.toLong * 10000000L)).as("user_id"),
        $"event_type", $"value")
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val vecs = EventOps.profileVecs(spark, dir).persist()
    val users = vecs.count()
    val (pt, pk) = EventOps.profParams(users)
    // Candidate volume: by default the distinct-pair count is HLL++
    // (rsd 0.5%) over the PRE-distinct stream plus an exact raw-pair
    // count, both in ONE aggregate that pipelines straight out of the
    // bucket join — no pair-stream shuffle, so the probe itself scales
    // like the r19 slim-top query shape. SPARK_GRAFT_EV_RUNG_EXACT=1
    // restores the exact distinct count (a full pair-stream shuffle —
    // only affordable well below the ~1M-user rung on one host).
    val exact = sys.env.get("SPARK_GRAFT_EV_RUNG_EXACT").contains("1")
    val raw = EventOps.tsCandidates(vecs, pt, pk,
      cap = EventOps.profCap(users), dedup = false)
    val t0 = System.nanoTime()
    val (cands, rawPairs) =
      if (exact) {
        val c = EventOps.tsCandidates(vecs, pt, pk,
          cap = EventOps.profCap(users)).count()
        (c, raw.count())
      } else {
        val row = raw.agg(
          approx_count_distinct(struct(col("user_a"), col("user_b")), 0.005),
          count(lit(1))).head()
        (row.getLong(0), row.getLong(1))
      }
    val candSec = (System.nanoTime() - t0) / 1e9
    val allPairs = users * (users - 1) / 2
    val t1 = System.nanoTime()
    EventOps.tsSimilarity(spark, dir).count()
    val fullSec = (System.nanoTime() - t1) / 1e9
    spark.catalog.clearCache()
    println(s"""{"probe":"ev_rung","k":$k,"users":$users,"pk":$pk,"pt":$pt,"candidates":$cands,"cand_count_mode":"${if (exact) "exact" else "hll_rsd005"}","raw_pairs":$rawPairs,"cands_per_user":${r3(cands.toDouble / users)},"selectivity":${r3(cands.toDouble / allPairs)},"cand_sec":${r3(candSec)},"full_sec":${r3(fullSec)}}""")
    spark.stop()
  }
}
