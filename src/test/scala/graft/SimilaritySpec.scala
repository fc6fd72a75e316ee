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

  /** r15 ranked multi-probe: the probing-sequence contract. The probe
    * set must be (a) exactly pt·(1+mult) buckets per query and (b) a
    * SUBSET of the all-flips multiprobe probe set — ranked probing only
    * reorders and truncates the classic perturbation set, never invents
    * a probe outside Hamming-1. Checked via the internals at the gate SF
    * (base rung 4×6: 12 ranked vs 28 all-flips probes per query). */
  test("ranked multi-probe probes are a fixed-budget subset of all flips") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val e = Similarity.vecs(spark, TestSpark.sf)
    val n = e.count()
    val (pt, pb) = Similarity.lshParams(n)
    val buckets = Similarity.lshBuckets(e, tables = pt, bits = pb).persist()
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
    val qb = buckets.join(q, $"vec_id" === $"query_id")
      .select($"query_id", $"tbl", $"bucket")
    val flips = Similarity.rankedFlips(q, pt, pb,
      Similarity.LshRankedProbeMult * pt)
    val ranked = qb.unionByName(
      qb.join(flips, Seq("query_id", "tbl"))
        .select($"query_id", $"tbl", $"bucket".bitwiseXOR($"flip").as("bucket")))
    // (a) fixed budget per query
    val perQuery = ranked.groupBy($"query_id").count()
      .select(countDistinct($"count"), first($"count")).head()
    assert(perQuery.getLong(0) === 1L)
    assert(perQuery.getLong(1) === (pt * (1 + Similarity.LshRankedProbeMult)).toLong)
    // (b) subset of the classic all-flips probe set
    val allFlips = qb
      .withColumn("flip",
        explode(array((lit(0L) +: (0 until pb).map(j => lit(1L << j))): _*)))
      .select($"query_id", $"tbl", $"bucket".bitwiseXOR($"flip").as("bucket"))
    assert(ranked.except(allFlips).count() === 0L,
      "ranked probe outside the Hamming-1 perturbation set")
    buckets.unpersist(); spark.catalog.clearCache()
  }

  test("ranked multi-probe recall@5 beats single-probe at a third of the flips") {
    val mp = recallAt5(topk(Similarity.topkLshMultiprobe(spark, TestSpark.sf)))
    val rk = recallAt5(topk(Similarity.topkLshMultiprobeRanked(spark, TestSpark.sf)))
    val sp = recallAt5(topk(Similarity.topkLsh(spark, TestSpark.sf)))
    info(s"recall@5 single=$sp ranked=$rk all-flips=$mp")
    // ranked probes 12 buckets vs 28 all-flips: must keep a clear margin
    // over single-probe (4 buckets) — the Lv et al. claim that low-margin
    // flips carry most of the recall mass
    assert(rk > sp, s"ranked $rk <= single-probe $sp")
    spark.catalog.clearCache()
  }

  /** r15 corpus-side twin collapse: on a corpus where every vector has
    * 7 exact twins (8 verbatim replicas of sf0.001's embeddings, ids
    * offset), the top-5 result must equal the UNTRUNCATED brute ground
    * truth computed in-spec — the scaladoc domination proof, checked
    * empirically — and no class may keep more than K+1 = 6 members. */
  test("ANN twin collapse is output-invariant for the top-5 contract") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dir = "/tmp/twin_emb_spec"
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001")
    (0 until 8).map { r =>
      base.select(($"vec_id" + lit(r.toLong * 100000L)).as("vec_id"),
        $"embedding", $"label")
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val e = Similarity.vecs(spark, dir)
    val maxClass = Similarity.collapseTwins(e)
      .groupBy($"v").count().select(max($"count")).head().getLong(0)
    assert(maxClass <= Similarity.AnnTwinKeep.toLong,
      s"class of $maxClass survived the collapse")

    // untruncated brute ground truth, same arithmetic
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id".asc)
    val expected = q.join(
        e.select($"vec_id".as("neighbor_id"), $"v".as("nv"), $"norm".as("nnorm")),
        $"neighbor_id" =!= $"query_id")
      .withColumn("score",
        round(graft.functions.VectorDot.vectorDot($"qv", $"nv") / ($"qnorm" * $"nnorm"), 6))
      .withColumn("rnk", row_number().over(byQuery))
      .where($"rnk" <= 5)
      .select($"query_id", $"neighbor_id", $"rnk", $"score")
      .orderBy($"query_id", $"rnk").collect().toSeq

    val got = Similarity.topkBruteForce(spark, dir).collect().toSeq
    assert(got === expected,
      "collapsed brute top-5 diverged from the untruncated ground truth")
    spark.catalog.clearCache()
  }

  /** r16: the 8-replica spec above uses UNIFORM class sizes; the
    * domination proof must also hold when class sizes straddle the
    * [[Similarity.AnnTwinKeep]] bound unevenly (some classes collapse,
    * some don't, queries may themselves be twins). Randomized rounds:
    * per seed, each base vector gets a hash-derived multiplicity in
    * 1..8, and the collapsed brute must reproduce the untruncated
    * ground truth exactly. */
  test("twin collapse invariance holds under random class multiplicities") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001")
    Seq(11, 23, 47).foreach { seed =>
      val dir = s"/tmp/twin_emb_prop_$seed"
      base.withColumn("m", pmod(hash($"vec_id", lit(seed)), lit(8)) + 1)
        .withColumn("r", explode(sequence(lit(0), $"m" - 1)))
        .select(($"vec_id" + $"r".cast("long") * 100000L).as("vec_id"),
          $"embedding", $"label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val e = Similarity.vecs(spark, dir)
      val q = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
      val byQuery = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id".asc)
      val expected = q.join(
          e.select($"vec_id".as("neighbor_id"), $"v".as("nv"), $"norm".as("nnorm")),
          $"neighbor_id" =!= $"query_id")
        .withColumn("score",
          round(graft.functions.VectorDot.vectorDot($"qv", $"nv") / ($"qnorm" * $"nnorm"), 6))
        .withColumn("rnk", row_number().over(byQuery))
        .where($"rnk" <= 5)
        .select($"query_id", $"neighbor_id", $"rnk", $"score")
        .orderBy($"query_id", $"rnk").collect().toSeq
      val got = Similarity.topkBruteForce(spark, dir).collect().toSeq
      assert(got === expected,
        s"seed $seed: collapsed brute top-5 diverged from untruncated truth")
      spark.catalog.clearCache()
    }
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

  test("IVF-PQ cell ladder rungs are pinned (oracle iprm CASE mirrors them)") {
    import operators.Similarity.ivfPqParams
    // bench SFs (≤2,000 vectors) stay on the r13-tuned base rung
    assert(ivfPqParams(500L) === (64, 24))
    assert(ivfPqParams(2000L) === (64, 24))
    assert(ivfPqParams(8191L) === (64, 24))
    assert(ivfPqParams(8192L) === (128, 32))
    // r20 nprobe table (~32·1.75^i): the dial sweep measured rung
    // recall coarse-quantizer-limited — 132k 0.597 → 0.696 at nprobe
    // 128, 1M 0.514 → 0.734 with nprobe 172 + ks 64 (BASELINE.md
    // "IVF×PQ dials past R"); scan fraction still falls per rung
    assert(ivfPqParams(32768L) === (256, 56))
    assert(ivfPqParams(131072L) === (512, 98))
    assert(ivfPqParams(524288L) === (1024, 172))
    assert(ivfPqParams(2097152L) === (2048, 300))
    assert(ivfPqParams(8388608L) === (4096, 525))
    // r20 PQ sub-codebook ladder: 16 entries below 131,072 vectors
    // (every gate SF — hashes unchanged), 64 at/above (6-bit codes;
    // 256 measured +0.007 over 64 and not taken)
    import operators.Similarity.pqKsFor
    assert(pqKsFor(500L) === 16)
    assert(pqKsFor(2000L) === 16)
    assert(pqKsFor(131071L) === 16)
    assert(pqKsFor(131072L) === 64)
    assert(pqKsFor(4000000L) === 64)
    // r19 rerank-shortlist ladder (R = 300·2^(i+1) at the same
    // thresholds; measured knees at 132k → 2400 and 1M → 4800,
    // BASELINE.md R-sweep) — gate SFs stay on the base R=300
    import operators.Similarity.ivfPqShortlistFor
    assert(ivfPqShortlistFor(2000L) === 300)
    assert(ivfPqShortlistFor(8191L) === 300)
    assert(ivfPqShortlistFor(8192L) === 600)
    assert(ivfPqShortlistFor(132000L) === 2400)
    assert(ivfPqShortlistFor(1000000L) === 4800)
    assert(ivfPqShortlistFor(8388608L) === 19200)
    // the point of the ladder: the per-query code-scan FRACTION
    // (nprobe/cells) strictly falls across rungs, while cells rise
    val rungs = Seq(1L, 8192L, 32768L, 131072L, 524288L, 2097152L,
      8388608L).map(ivfPqParams)
    assert(rungs.sliding(2).forall { case Seq((c1, p1), (c2, p2)) =>
      c2 > c1 && p2.toDouble / c2 < p1.toDouble / c1 })
  }

  test("plain-IVF cell ladder rungs are pinned (oracle vprm CASE mirrors them)") {
    import operators.Similarity.ivfParams
    // bench SFs (≤2,000 vectors) stay on the historical (16, 4) grid
    assert(ivfParams(500L) === (16, 4))
    assert(ivfParams(2000L) === (16, 4))
    assert(ivfParams(8191L) === (16, 4))
    assert(ivfParams(8192L) === (64, 8))
    assert(ivfParams(32768L) === (128, 12))
    assert(ivfParams(131072L) === (256, 16))
    // r17 closed-form rungs (cells 64·2^i, nprobe 8+4i at 8192·4^i)
    assert(ivfParams(524288L) === (512, 20))
    assert(ivfParams(2097152L) === (1024, 24))
    assert(ivfParams(8388608L) === (2048, 28))
    // nominal scan fraction strictly falls across rungs (25% → 1.4%)
    val rungs = Seq(1L, 8192L, 32768L, 131072L, 524288L, 2097152L,
      8388608L).map(ivfParams)
    assert(rungs.sliding(2).forall { case Seq((c1, p1), (c2, p2)) =>
      c2 > c1 && p2.toDouble / c2 < p1.toDouble / c1 })
  }

  test("IVF-PQ above the base rung: serve-from-index == train-in-query, sane top-k") {
    // a 2×-replicated corpus past the first rung threshold exercises the
    // parametric (cells, nprobe) path end-to-end — the oracle gate only
    // runs at base-rung SFs, so the ladder plumbing gets its own pin
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_rung").toString
    val emb = Tables.embeddings(spark, TestSpark.sf).select(col("vec_id"), col("embedding"))
    // 5 rotated replicas of sf0.01 (500 rows) = 2,500 < 8,192: stay cheap
    // but prove the parametric path with a NON-default cells value by
    // replicating to 10,000 rows (rung 1: 128 cells, 32 probes)
    (0 until 20).map { r =>
      val rot = r % 64
      emb.select(
        (col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
        (if (rot == 0) col("embedding")
         else concat(slice(col("embedding"), rot + 1, 64 - rot),
                     slice(col("embedding"), 1, rot))).as("embedding"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(operators.Similarity.ivfPqParams(n) === (128, 32))
    val composed = Similarity.topkIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val served = Similarity.topkIvfPqServe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(composed.nonEmpty)
    assert(composed.toSeq === served.toSeq,
      "materialized-index serve diverged from the composed form at rung 1")
    // every query gets at most K ranked neighbors, ranks dense from 1
    composed.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length),
        s"query $q ranks not dense")
      assert(rows.length <= 5)
    }
  }

  test("O(n^2) baselines fail fast past the bound, naming their twin (VERDICT r13 #6)") {
    val key = graft.ExactScanGuard.ConfKey
    try {
      spark.conf.set(key, "10") // sf0.01 has 500 vectors — trips the guard
      val e1 = intercept[IllegalStateException] {
        Similarity.topkBruteForce(spark, TestSpark.sf).collect()
      }
      assert(e1.getMessage.contains("sim_topk_ivfpq_serve"),
        s"guard message does not name the twin: ${e1.getMessage}")
      val e2 = intercept[IllegalStateException] {
        operators.Dedup.embeddingCosine(spark, TestSpark.sf).collect()
      }
      assert(e2.getMessage.contains("dedup_embcos_audit"),
        s"guard message does not name the twin: ${e2.getMessage}")
      // opt-out: -1 disables the guard
      spark.conf.set(key, "-1")
      assert(Similarity.topkBruteForce(spark, TestSpark.sf).limit(1).count() === 1L)
    } finally {
      spark.conf.unset(key)
      spark.catalog.clearCache()
    }
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
    // r14 trained hand-over: past the top first-n rung the centroids
    // come from the TrainCap-bounded Lloyd (the ivfPqCentroids path,
    // semKmCte mirror).
    //
    // r18 ONE-SHOT schedule (the registered query's, VERDICT r17 #1):
    // trained cells ride the assignment/pair balance point c* = √(n/2)
    // with thresholds GEOMETRICALLY CENTERED on it (256·2^j at
    // 65536·4^j — c* is exact at each rung's geometric center
    // 131072·4^j, and cells/c* stays in [1/√2, √2], cost ≤1.06× of the
    // model optimum vs 1.25× floor-pinned). Centering is model-driven
    // within the measured 2M session-noise band; the above-noise
    // refutation is of the old 2048-cell schedule (61.8 s vs 17-21 s
    // at 200k) — BASELINE.md r18 "one-shot cells recalibrated".
    // Oracle sprm CASE mirror.
    assert(operators.Similarity.semPlan(131071L) === ((1024, false)))
    assert(operators.Similarity.semPlan(131072L) === ((256, true)))
    assert(operators.Similarity.semPlan(262143L) === ((256, true)))
    assert(operators.Similarity.semPlan(262144L) === ((512, true)))
    assert(operators.Similarity.semPlan(1048575L) === ((512, true)))
    assert(operators.Similarity.semPlan(1048576L) === ((1024, true)))
    assert(operators.Similarity.semPlan(2000000L) === ((1024, true)))
    assert(operators.Similarity.semPlan(4194304L) === ((2048, true)))
    assert(operators.Similarity.semPlan(10000000L) === ((2048, true)))
    // r18 AT-REST schedule (SemDedupStream.corpusIndex): keeps the r17
    // cells-double-per-×4 rule (2048·2^j) — assignment is amortized
    // across micro-batch screens, so smaller cells win strictly there
    // and the schedules legitimately diverge. Below the hand-over the
    // two plans agree (the semCells ladder).
    assert(operators.Similarity.semPlanAtRest(131071L) === ((1024, false)))
    assert(operators.Similarity.semPlanAtRest(131072L) === ((2048, true)))
    assert(operators.Similarity.semPlanAtRest(524287L) === ((2048, true)))
    assert(operators.Similarity.semPlanAtRest(524288L) === ((4096, true)))
    assert(operators.Similarity.semPlanAtRest(2097152L) === ((8192, true)))
    assert(operators.Similarity.semPlanAtRest(8388608L) === ((16384, true)))
    assert(operators.Similarity.semPlanAtRest(10000000L) === ((16384, true)))
    (1L to 20L).map(_ * 100000L).foreach { n =>
      assert(operators.Similarity.semPlan(n)._2 ===
        operators.Similarity.semPlanAtRest(n)._2,
        s"trained? must agree between the plans at n=$n")
    }
  }

  test("sign-LSH ladder rungs are pinned (oracle prm CASE mirrors them)") {
    import operators.Similarity.lshParams
    // bench SFs (≤2,000 vectors) stay on the r10-tuned (4, 6) base
    assert(lshParams(2000L) === (4, 6))
    assert(lshParams(8191L) === (4, 6))
    // measured rungs (r12–r14), now generated by the closed form
    // (tables round(6·1.5^i), bits 8+2i at 8192·4^i) — pinned because
    // the oracle CASE and the plane-pool addressing inline them
    assert(lshParams(8192L) === (6, 8))
    assert(lshParams(32768L) === (9, 10))
    assert(lshParams(131072L) === (14, 12))
    // r17 closed-form extension rungs
    assert(lshParams(524288L) === (20, 14))
    assert(lshParams(1000000L) === (20, 14))
    assert(lshParams(2097152L) === (30, 16))
    assert(lshParams(8388608L) === (46, 18))
    // amplification monotone; per-bucket expected occupancy n/2^bits
    // stays bounded (≤ 64·base) along every generated rung
    val sizes = Seq(1L, 8192L, 32768L, 131072L, 524288L, 2097152L, 8388608L)
    val rungs = sizes.map(lshParams)
    assert(rungs.sliding(2).forall { case Seq((t1, b1), (t2, b2)) =>
      t2 >= t1 && b2 >= b1 })
    sizes.zip(rungs).foreach { case (n, (_, bits)) =>
      assert((n.toDouble / (1L << bits)) <= 64.0,
        s"expected occupancy blew up at n=$n, bits=$bits") }
  }

  /** ADVICE r15: training assignment rides [[Similarity.semAssign]],
    * whose nanvl(ccos, 1.0) exists for zero-norm VECTORS — a zero-norm
    * CENTROID would score NaN→1.0 (d = 0) against every vector and
    * capture a whole Lloyd iteration. The guard makes such centroids
    * impossible: degenerate seeds filtered, zero-cancelling means keep
    * the previous centroid. This pins both halves of the contract. */
  test("zero-norm centroids cannot arise in Lloyd training (ADVICE r15)") {
    import org.apache.spark.sql.functions.{col, sqrt}
    import graft.functions.VectorDot.vectorDot
    val s = spark; import s.implicits._
    val dim = 64
    def unit(i: Int): Array[Double] =
      Array.tabulate(dim)(j => if (j == i) 1.0 else 0.0)
    def near(i: Int, eps: Double): Array[Double] = {
      val a = unit(i); a((i + 1) % dim) = eps; a
    }
    val rows = Seq(
      (0L, Array.fill(dim)(0.0)), // zero-norm SEED candidate (vec_id < cells)
      (1L, unit(0)), (2L, unit(1)), (3L, unit(2))
    ) ++ (4 to 9).map(k => (k.toLong, near(k % 3, 0.05 * (k - 3))))
    val e = rows.toDF("vec_id", "v")
      .withColumn("norm", sqrt(vectorDot(col("v"), col("v"))))
    try {
      val cb = operators.Similarity.ivfPqCentroids(e, cells = 4).collect()
      // the degenerate seed is filtered, every surviving centroid nonzero
      assert(!cb.exists(_.getAs[Long]("cid") == 0L))
      cb.foreach(r => assert(r.getAs[Double]("cnorm") > 0))
      val assign = operators.Similarity
        .semAssign(e, operators.Similarity.ivfPqCentroids(e, cells = 4))
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
      // zero-norm VECTOR half of the contract: pinned to the lowest cid
      assert(assign(0L) === cb.map(_.getAs[Long]("cid")).min)
      // no capture: nonzero vectors spread over distinct cells
      assert((assign - 0L).values.toSet.size >= 2)
      // untrained first-n path rides the same guard (r16): the engines
      // DISAGREE on a zero-norm centroid (engine d=0 wins, oracle's
      // x/0→NULL sorts last and loses), so seeds filter it on both sides
      val cf = operators.Similarity.centroidsOf(e, ncent = 4).collect()
      assert(!cf.exists(_.getAs[Long]("cid") == 0L))
      cf.foreach(r => assert(r.getAs[Double]("cnorm") > 0))
    } finally operators.Similarity.releaseTrainingCaches()
  }
}
