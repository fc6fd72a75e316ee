package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

/** Streaming ANN serving: a stream of query vectors is answered with
  * exact-cosine top-k neighbors from a corpus at rest, candidates via the
  * SAME multi-probe LSH kernel as the registered `sim_ann_multiprobe`
  * batch query ([[Similarity.multiprobeCandidates]] /
  * [[Similarity.rankTopK]]) — completing the streaming story for the
  * similarity family the way [[DedupStream]]/[[SemDedupStream]] do for
  * dedup.
  *
  * Scale design:
  *   - the corpus index (vector relation + sign-LSH signatures) is built
  *     once and persisted — at rest it would be bucketed by (tbl, bucket),
  *     which is exactly the join key every probe hits;
  *   - per-batch work scales with the BATCH: query signatures are a
  *     per-row map (native [[graft.functions.ConstVectorDot]]
  *     projections), probes expand the query side only (×(1+BITS) flips),
  *     and candidates come from the (tbl, bucket) equi-join — the corpus
  *     never reshuffles per trigger;
  *   - answers are PER-QUERY (a pure function of the query vector and the
  *     fixed corpus), so results are invariant to micro-batch boundaries
  *     by construction — pinned in StreamingOpsSpec.
  */
object AnnServeStream {

  /** A prepared corpus index: the vector relation, its sign-LSH
    * `(vec_id, tbl, bucket)` signatures, and the ladder rung
    * ([[Similarity.lshParams]]) they were hashed with — query-side
    * signatures MUST use the same rung or the (tbl, bucket) join is
    * meaningless, so the rung travels with the index. */
  final case class LshIndex(vecs: DataFrame, buckets: DataFrame,
                            tables: Int, bits: Int)

  /** The corpus-at-rest index: the prepared vector relation and its
    * sign-LSH signatures, both persisted (the vectors feed the exact
    * verify, the signatures every probe join). The signature width
    * follows the corpus-size ladder, like the registered batch query. */
  def corpusIndex(corpus: DataFrame): LshIndex = {
    val e = SemDedupStream.prepVecs(corpus).persist()
    val n = e.count()
    val (pt, pb) = Similarity.lshParams(n)
    // The index stores CAPPED postings (r14 hot-bucket cap, a pure
    // function of the corpus size and rung): the probe join then has a
    // hard per-bucket work bound no matter how skewed the corpus, and
    // every consumer of the index inherits it for free.
    LshIndex(e,
      Similarity.capPostings(
        Similarity.lshBuckets(e, tables = pt, bits = pb),
        Similarity.lshPostingsCap(n, pb)).persist(),
      pt, pb)
  }

  // ---- Materialized form (VERDICT r12 #4): the index above lives only in
  // one run's cache — every restart re-hashes the corpus. The at-rest form
  // below writes the signature relation once and keys the path by the
  // corpus directory's parquet footprint, the [[graft.operators.Similarity]]
  // IVF-PQ staleness contract: a regenerated corpus changes the key, so a
  // stale index is UNREACHABLE rather than guarded against. The ladder
  // rung is STORED WITH the index (not recomputed at load): query-side
  // hashing must use the planes the corpus was signed with, and deriving
  // the rung from a live count could diverge from the stored signatures
  // if the ladder thresholds ever move between versions.

  /** Corpus dir → filesystem-safe name head shared by all of its index
    * keys (the stale-sibling sweep in [[writeIndex]] matches on it). */
  private def safeName(corpusDir: String): String =
    new java.io.File(corpusDir).getCanonicalPath
      .replaceAll("[^A-Za-z0-9._-]", "_")

  /** Materialization root for a corpus directory's LSH serve index, keyed
    * by its data files' (count, newest mtime, total bytes) PLUS a digest
    * of the sorted file names. Spark part-file names embed a per-write
    * job UUID, so a corpus regenerated with identical count/bytes inside
    * one mtime tick (or on a coarse-mtime filesystem) still changes the
    * digest — the mtime alone is NOT trusted to carry staleness. */
  private[graft] def indexPath(corpusDir: String): String = {
    val d = new java.io.File(corpusDir)
    val files = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val mtime = if (files.isEmpty) d.lastModified() else files.map(_.lastModified()).max
    val size = files.map(_.length()).sum
    val md = java.security.MessageDigest.getInstance("SHA-256")
    files.map(_.getName).sorted.foreach(n => md.update(n.getBytes("UTF-8")))
    val nameDigest = md.digest().take(8).map(b => f"$b%02x").mkString
    s"/tmp/graft_lsh_index/${safeName(corpusDir)}_${files.length}_${mtime}_${size}_$nameDigest"
  }

  /** Grace window before a superseded sibling index is swept: long enough
    * for any live process that loaded it to finish its run, short enough
    * that /tmp does not accumulate. Overridable for tests. */
  private[graft] var sweepAgeMs: Long = 6L * 3600 * 1000

  private def indexReady(p: String): Boolean =
    Seq("buckets", "rung").forall(x => new java.io.File(s"$p/$x/_SUCCESS").exists())

  /** Hash the corpus once and write the index at rest under `path`: the
    * `(vec_id, tbl, bucket)` signature relation plus a one-row `rung`
    * table — staged in a process-unique sibling dir and renamed into
    * place, so a concurrent builder racing on the same new corpus can
    * never expose a half-written index (the loser's rename fails against
    * the winner's completed dir and its staging dir is dropped). Also
    * best-effort-deletes SIBLING keys of the same corpus dir: each
    * regeneration changes the footprint key, and without the sweep every
    * old signature relation would sit in /tmp forever. */
  private def writeIndex(spark: SparkSession, corpusDir: String,
                         path: String): Unit = {
    val e = SemDedupStream.prepVecs(
      spark.read.parquet(corpusDir).select("vec_id", "embedding")).persist()
    val staging = s"$path.tmp-${java.lang.ProcessHandle.current().pid()}"
    try {
      val n = e.count()
      val (pt, pb) = Similarity.lshParams(n)
      // capped postings at rest — same relation [[corpusIndex]] serves
      Similarity.capPostings(
          Similarity.lshBuckets(e, tables = pt, bits = pb),
          Similarity.lshPostingsCap(n, pb))
        .write.mode("overwrite").parquet(s"$staging/buckets")
      import spark.implicits._
      Seq((pt, pb)).toDF("tables", "bits").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging/rung")
      if (!new java.io.File(staging).renameTo(new java.io.File(path)) &&
          !indexReady(path))
        throw new IllegalStateException(
          s"could not publish LSH index at $path (and no winner is present)")
    } finally {
      e.unpersist()
      deleteRecursively(new java.io.File(staging)) // no-op after a rename
      // stale siblings: same corpus dir, different (older) footprint key.
      // A differently-named corpus whose safe name extends this one can
      // match too — deleting its key only forces a rebuild there, never
      // wrong serving (staleness is carried by the key, not the sweep).
      // AGE-GATED (ADVICE r13): a process that loaded the old key lazily
      // (persisted DataFrames re-read parquet on cache eviction) must not
      // lose its files mid-run, so only siblings untouched for
      // `sweepAgeMs` are deleted — a fresh regeneration leaves the
      // previous index alive for that grace window, then it goes.
      // Orphaned `.tmp-<pid>` staging dirs from crashed builders are ALSO
      // swept here once their pid is no longer alive (they were excluded
      // before and accumulated in /tmp forever).
      val dir = new java.io.File(path).getParentFile
      val prefix = safeName(corpusDir) + "_"
      val now = System.currentTimeMillis()
      Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith(prefix) && f.getPath != path)
        .filter { f =>
          val tmpPid = "\\.tmp-(\\d+)$".r.findFirstMatchIn(f.getName)
          tmpPid match {
            case Some(m) => // staging dir: orphaned iff its builder died
              val pid = m.group(1).toLong
              pid != java.lang.ProcessHandle.current().pid() &&
                !java.lang.ProcessHandle.of(pid).map[Boolean](_.isAlive)
                  .orElse(false)
            case None => // published sibling: only past the grace window
              now - f.lastModified() > sweepAgeMs
          }
        }
        .foreach(deleteRecursively)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** The serve index for the corpus at `corpusDir`, from its at-rest
    * materialization — built first iff absent (first run, or the corpus
    * was regenerated and the old index's key no longer matches). The
    * path is computed ONCE and passed through the build, so the loaded
    * index is always the one that was just written even if the corpus
    * footprint shifts mid-build (the next call will see the new key and
    * rebuild). The returned relations are persisted for the run, exactly
    * like [[corpusIndex]]; the rung comes from the STORED index. */
  def loadOrBuildIndex(spark: SparkSession, corpusDir: String): LshIndex = {
    val p = indexPath(corpusDir)
    if (!indexReady(p)) writeIndex(spark, corpusDir, p)
    val rung = spark.read.parquet(s"$p/rung").collect().head
    val vecs = SemDedupStream.prepVecs(
      spark.read.parquet(corpusDir).select("vec_id", "embedding")).persist()
    LshIndex(vecs, spark.read.parquet(s"$p/buckets").persist(),
      rung.getAs[Int]("tables"), rung.getAs[Int]("bits"))
  }

  /** Answer one batch of `(vec_id, embedding)` query vectors against a
    * prepared corpus index. Returns `(query_id, neighbor_id, rnk, score)`.
    * Pure batch-side function, shared by the streaming and batch forms —
    * queries need NOT be corpus members (signatures are computed from the
    * query vectors with the same fixed planes the corpus was indexed
    * with), and query ids are treated as an UNRELATED id space: a corpus
    * vector numerically sharing a query's id is still a legitimate
    * neighbor (no self-exclusion — a query that IS in the corpus gets
    * itself back at rank 1 with score 1.0, which is the honest serving
    * answer). The query relation is derived ONCE: signatures carry
    * `v`/`norm` through the explode (queries are the small side), so no
    * second scan or re-norm join is needed. */
  def serveBatch(queries: DataFrame, idx: LshIndex, k: Int = 5): DataFrame = {
    val qb = Similarity.lshBuckets(SemDedupStream.prepVecs(queries),
        keep = Seq("v", "norm"), tables = idx.tables, bits = idx.bits)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"),
              col("tbl"), col("bucket"))
    val qmeta = qb.select(col("query_id"), col("qv"), col("qnorm"))
      .dropDuplicates("query_id")
    Similarity.rankTopK(
      Similarity.multiprobeCandidates(qb, idx.buckets, excludeSelf = false,
        bits = idx.bits),
      idx.vecs, qmeta, k)
  }

  /** [[serveBatch]] with the FIXED-BUDGET ranked probing sequence
    * (r15, [[Similarity.topkLshMultiprobeRanked]]'s kernel): instead of
    * all `tables · (1 + bits)` Hamming-1 probes — a per-query cost that
    * RISES with the signature ladder's bits (182 buckets at the 14×12
    * rung, where the measured serve qps dipped 364 → 154) — each query
    * probes its own buckets plus the `mult · tables` single-bit flips
    * with the smallest projection margins. Probe count is
    * `tables · (1 + mult)` at every rung, so per-query serve cost stops
    * riding the corpus ladder; the recall trade per rung is measured in
    * SimilarityScaleBench (`ann_ranked_sweep`). Everything is
    * query-side — the index, its capped postings, and the stored rung
    * are shared with the all-flips form unchanged. Same serving
    * contract: no self-exclusion, and a corpus-member query still
    * returns itself at rank 1 (its own buckets are always probed). */
  def serveBatchRanked(queries: DataFrame, idx: LshIndex, k: Int = 5,
                       mult: Int = Similarity.LshRankedProbeMult): DataFrame = {
    val qb0 = Similarity.lshBuckets(SemDedupStream.prepVecs(queries),
        keep = Seq("v", "norm"), tables = idx.tables, bits = idx.bits)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"),
              col("tbl"), col("bucket"))
    val qmeta = qb0.select(col("query_id"), col("qv"), col("qnorm"))
      .dropDuplicates("query_id")
    val base = qb0.select(col("query_id"), col("tbl"), col("bucket"))
    val flipped = base
      .join(Similarity.rankedFlips(qmeta, idx.tables, idx.bits, mult * idx.tables),
        Seq("query_id", "tbl"))
      .select(col("query_id"), col("tbl"),
        col("bucket").bitwiseXOR(col("flip")).as("bucket"))
    val cand = base.unionByName(flipped)
      .join(idx.buckets.select(col("vec_id").as("neighbor_id"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    Similarity.rankTopK(cand, idx.vecs, qmeta, k)
  }

  /** The serve-kernel dial (r16, closing the named residue): the two
    * kernels trade recall for cost, and the choice belongs to the
    * CALLER, not a silent rung-adaptive swap. [[AllFlips]] is the
    * recall-maximal default (recall@5 0.432 at the 14×12 rung) whose
    * per-query probe count rides the ladder's bits (182 at that rung —
    * measured qps 355 → 114 across the 9×10 → 14×12 jump);
    * [[Ranked]] probes a fixed `tables·(1+mult)` budget of
    * smallest-margin flips (42 at the same rung, recall 0.247, qps
    * ~270 FLAT across the jump) — the shape a cost-bounded fleet runs
    * at top rungs. The budget dial (`mult`) is calibrated by the
    * `ann_ranked_sweep` rows in the scale artifact. */
  sealed trait ServeKernel
  case object AllFlips extends ServeKernel
  final case class Ranked(mult: Int = Similarity.LshRankedProbeMult)
      extends ServeKernel

  /** foreachBatch driver: starts the streaming query answering each
    * micro-batch of `queries` (a STREAMING `(vec_id, embedding)` frame)
    * against the prepared index. The single streaming entry point — the
    * checkpointed [[AnnServeJob]] routes through here. */
  def start(queries: DataFrame, idx: LshIndex,
            k: Int = 5, checkpoint: Option[String] = None,
            kernel: ServeKernel = AllFlips)
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    var w = queries.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val answers = kernel match {
          case AllFlips     => serveBatch(batch, idx, k)
          case Ranked(mult) => serveBatchRanked(batch, idx, k, mult)
        }
        onBatch(answers, epochId)
      }
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    w.start()
  }
}

/** Runnable, checkpointed form of [[AnnServeStream]] (template:
  * [[DedupStreamJob]]): file-stream a directory of query-vector parquet
  * files against a corpus directory at rest, and write each micro-batch's
  * top-k answers to `output/epoch=N/`.
  *
  * Exactly-once across restarts without a transactional sink, exactly as
  * in [[DedupStreamJob]]: a replayed epoch deterministically overwrites
  * its own `epoch=N` directory and nothing else; readers see the union
  * via partition discovery. RecoverySpec kills the query between epochs
  * and proves the restarted run loses no answer and duplicates none.
  */
object AnnServeJob {

  val querySchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Canonical CLI/marker spelling of a serve kernel (the `--kernel`
    * grammar, round-trippable by `main`'s parser). */
  private[graft] def kernelTag(k: AnnServeStream.ServeKernel): String =
    k match {
      case AnnServeStream.AllFlips     => "allflips"
      case AnnServeStream.Ranked(mult) => s"ranked:$mult"
    }

  /** Pins the serve kernel to the checkpoint (ADVICE r16): the kernel
    * changes WHICH answers each epoch holds, so restarting a checkpointed
    * run under a different `--kernel` would silently mix epochs computed
    * under two kernels in one output dir — quietly voiding the
    * exactly-once "answers == one-shot serve" contract RecoverySpec pins.
    * First start writes a `graft-serve-kernel` marker beside the offsets
    * log; every restart re-reads it and fails fast on mismatch (the
    * remedy is a fresh checkpoint+output dir, named in the error). */
  private[graft] def pinKernel(spark: SparkSession, checkpointDir: String,
                                   kernel: AnnServeStream.ServeKernel): Unit = {
    val tag = kernelTag(kernel)
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "graft-serve-kernel")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // An empty/blank marker is a truncated write from a crash mid-pin —
    // treat it as absent and rewrite, instead of mismatching every
    // kernel (including the original one) forever (ADVICE r17).
    val pinned: Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
        if (s.isEmpty) None else Some(s)
      }
    pinned match {
      case Some(prev) if prev != tag => throw new IllegalStateException(
        s"checkpoint $checkpointDir was created with --kernel $prev but this " +
        s"restart requested --kernel $tag; earlier epochs in the output dir hold " +
        s"$prev answers, so resuming would mix kernels under one exactly-once " +
        "contract. Use a fresh --checkpoint and --output to change kernels.")
      case Some(_) => () // already pinned to this kernel
      case None =>
        // Crash-safe pin: write the full tag to a temp path, then rename
        // into place — rename is atomic on local FS/HDFS, so the marker
        // is either absent or complete, never truncated (ADVICE r17).
        val tmp = new org.apache.hadoop.fs.Path(
          checkpointDir, s"graft-serve-kernel.tmp-${java.util.UUID.randomUUID}")
        val out = fs.create(tmp, true)
        try out.write(tag.getBytes("UTF-8")) finally out.close()
        if (fs.exists(p)) fs.delete(p, false) // blank marker from a crash
        if (!fs.rename(tmp, p)) {
          fs.delete(tmp, false)
          throw new IllegalStateException(
            s"could not atomically pin serve kernel marker at $p")
        }
    }
  }

  def run(spark: SparkSession, corpusDir: String, inputDir: String,
          outputDir: String, checkpointDir: String, k: Int = 5,
          maxFilesPerTrigger: Int = 1,
          kernel: AnnServeStream.ServeKernel = AnnServeStream.AllFlips)
         : StreamingQuery = {
    pinKernel(spark, checkpointDir, kernel)
    // At-rest index, keyed by the corpus footprint: a restart re-reads the
    // stored signatures instead of re-hashing the corpus; a regenerated
    // corpus misses the key and rebuilds (stale index unreachable).
    val idx = AnnServeStream.loadOrBuildIndex(spark, corpusDir)
    val stream = spark.readStream.schema(querySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(inputDir)
      .select("vec_id", "embedding")
    // Release the per-run cached index when THIS query terminates;
    // [[StreamLifecycle.withRelease]] covers the throwing-start() /
    // terminated-before-listener races (ADVICE r16).
    StreamLifecycle.withRelease(spark) {
      AnnServeStream.start(stream, idx, k,
        checkpoint = Some(checkpointDir), kernel = kernel) { (answers, epochId) =>
        answers.write.mode("overwrite").parquet(s"$outputDir/epoch=$epochId")
      }
    } { () => idx.vecs.unpersist(); idx.buckets.unpersist() }
  }

  /** `--corpus --input --output --checkpoint [--k N]` CLI, same option
    * style as [[DedupStreamJob]]. */
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val spark = TaxiJobs.session("AnnServe")
    run(spark,
      opts.getOrElse("corpus", "corpus"),
      opts.getOrElse("input", "queries"),
      opts.getOrElse("output", "output"),
      opts.getOrElse("checkpoint", "checkpoint"),
      opts.get("k").map(_.toInt).getOrElse(5),
      // --kernel allflips (default, recall-maximal) | ranked[:mult]
      // (fixed probe budget — per-query cost decoupled from the rung)
      kernel = opts.get("kernel").map(_.split(":")) match {
        case Some(Array("ranked"))       => AnnServeStream.Ranked()
        case Some(Array("ranked", mult)) => AnnServeStream.Ranked(mult.toInt)
        case Some(Array("allflips")) | None => AnnServeStream.AllFlips
        case Some(other) => throw new IllegalArgumentException(
          s"--kernel ${other.mkString(":")} (expected allflips | ranked[:mult])")
      }).awaitTermination()
  }
}
