package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite corpus-curation pipeline — the end-to-end shape a
  * pretraining-data job runs, chaining the individual operators this
  * library provides: quality scoring → threshold filter → near-duplicate
  * removal (n-gram Jaccard pairs, drop the higher doc_id of each pair) →
  * per-language corpus profile.
  *
  * One Spark job, fully declarative: Catalyst fuses the quality scan with
  * the filter; the near-dup pair generation is [[Dedup.ngramJaccard]]'s
  * prefix-filtered index (never O(n²)); the removal is a broadcast
  * left-anti join (the pair set is tiny relative to the corpus by
  * construction); the profile is one partial-aggregated shuffle on lang.
  *
  * Aggregates are chosen order-independent (counts, integer sums, min /
  * max of already-rounded scores, one exact division) so the oracle
  * comparison is bit-stable.
  */
object Pipelines extends QueryModule {

  private val qualityThreshold = 0.70

  def corpusCuration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val quality = TextOps.quality(s, dir)
      .select($"doc_id", $"n_tokens", $"quality_score")
    val nearDupLosers = Dedup.ngramJaccard(s, dir)
      .select($"doc_b".as("doc_id")).distinct()
    Tables.documents(s, dir).select($"doc_id", $"lang")
      .join(quality, "doc_id")
      .where($"quality_score" >= qualityThreshold)
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("sum_tokens"),
        round(sum($"n_tokens") / count(lit(1)), 6).as("avg_tokens"),
        min($"quality_score").as("min_quality"),
        max($"quality_score").as("max_quality"))
      .orderBy($"lang")
  }

  // Deterministic per-doc hash for sampling/sharding: Knuth multiplicative
  // hash over doc_id, kept in exact BIGINT range so DuckDB reproduces it
  // bit-for-bit (doc_id * 2654435761 stays far below 2^63 at any tested
  // SF; a production corpus with 2^33+ doc ids would switch to a mixed
  // 64-bit hash — same plan shape, different literal).
  private val HashMul = 2654435761L
  private val HashMod = 4294967296L
  private def docHash = (col("doc_id") * HashMul) % HashMod
  private val hashSql = s"(doc_id * $HashMul) % $HashMod"

  /** Domain-mix sampling: down-sample each source to a target rate with a
    * DETERMINISTIC per-doc hash instead of rand() — re-running the job,
    * adding executors, or reprocessing a partition yields the same
    * sample, which is what makes a 100 TB mixing job auditable and
    * resumable. Target rates here cycle 25/50/75/100 permille-quarters by
    * source index (a stand-in for the user-supplied mix config).
    *
    * One scan, zero pre-aggregation shuffles: keep/drop is a per-row
    * predicate, and the per-source audit (before/after/achieved rate) is
    * a single partially-aggregated groupBy. Changing the mix re-runs only
    * this filter — no data movement. */
  def domainMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("rate_permille",
        (substring($"source", 4, 10).cast("int") % 4 + 1) * 250)
      .withColumn("kept", (docHash % 1000 < $"rate_permille").cast("int"))
      .groupBy($"source")
      .agg(
        first($"rate_permille").as("rate_permille"),
        count(lit(1)).as("n_before"),
        sum($"kept").cast("long").as("n_after"),
        round(sum($"kept") / count(lit(1)), 6).as("achieved_rate"))
      .orderBy($"source")
  }

  private val SeqLen = 256

  /** Training-sequence packing (GPT-style concat-then-chunk): documents
    * are concatenated in deterministic (source, doc_id) order and cut
    * into fixed 256-token sequences; output is the per-sequence manifest
    * (how many docs contribute, how many tokens land in it).
    *
    * The packing key is the SCALE decision: a single global concat order
    * is a one-partition window (a scale-killer at 100 TB), so packing
    * runs independently per source/shard — window partitioned by source,
    * exactly how production packers shard the corpus first and pack
    * within shards, accepting one partial tail sequence per shard. */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bySource = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"source", $"doc_id",
        size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("off", coalesce(sum($"n_tok").over(bySource), lit(0L)))
      .withColumn("first_seq", expr(s"off div $SeqLen"))
      .withColumn("last_seq", expr(s"(off + n_tok - 1) div $SeqLen"))
      .withColumn("seq_id", explode(expr("sequence(first_seq, last_seq)")))
      .withColumn("contrib",
        least((col("seq_id") + 1) * SeqLen, $"off" + $"n_tok")
          - greatest(col("seq_id") * SeqLen, $"off"))
      .groupBy($"source", $"seq_id")
      .agg(count(lit(1)).as("n_docs"), sum($"contrib").as("n_tokens"))
      .orderBy($"source", $"seq_id")
  }

  private val NShards = 16

  /** Shard assignment for training-data writes: hash each doc to one of
    * 16 shards and audit the balance (doc counts, token mass, source
    * spread, id range per shard). The same `shard` expression feeds
    * `df.repartition($"shard").write.partitionBy("shard")` for the real
    * write — multiplicative hashing gives near-uniform shards without a
    * global sort, and the audit query IS the balance check a 100 TB
    * shard job runs before committing a corpus release.
    *
    * The shard is the HIGH 4 bits of the 32-bit product (Fibonacci
    * hashing's contract, same fix as [[epochShuffle]]): `% 16` of a
    * multiplicative hash with odd K is just the INPUT's low 4 bits —
    * perfectly "balanced" on sequential synthetic ids, silently
    * clustered the moment ids carry structure (per-source id blocks,
    * striding), which is exactly what a production corpus has. */
  def shardAssign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("shard", expr(s"CAST($hashSql DIV ${HashMod / NShards} AS INT)"))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split($"text", " "))).cast("long").as("sum_tokens"),
        countDistinct($"source").as("n_sources"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id"))
      .orderBy($"shard")
  }

  /** Deterministic train/val/test split with a cross-split leakage audit
    * — the assignment a training job must make exactly once and never
    * revisit (an 80/10/10 cut by the same multiplicative doc_id hash as
    * [[domainMix]], so membership is reproducible from the id alone, no
    * stored split table needed), plus the check that makes the split
    * trustworthy: documents whose EXACT text also appears in a different
    * split (train/test contamination through duplicates — the reason
    * splits are audited before a model is trained on them). NULL-text
    * docs are excluded on both sides (the library's NULL-document
    * convention, see [[mixEpochs]]).
    *
    * Scale: split assignment is a per-row expression (no shuffle); the
    * leakage audit is one md5(text)-keyed agg + digest join back — the
    * 16-byte digest shuffles, never the text (same shape as
    * [[datasetCard]]'s dup burden) — then one 3-key partial agg. */
  def trainSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .where($"text".isNotNull)
      .select($"doc_id", md5($"text").as("h"),
        size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("bucket", (docHash % 10).cast("int"))
      .withColumn("split",
        when($"bucket" <= 7, "train")
          .when($"bucket" === 8, "val")
          .otherwise("test"))
    val spread = docs.groupBy($"h")
      .agg(countDistinct($"split").as("n_splits"))
    docs.join(spread, "h")
      .groupBy($"split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        sum(when($"n_splits" > 1, 1L).otherwise(0L)).as("n_leaked_docs"),
        round(sum(when($"n_splits" > 1, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("leak_ratio"))
      .orderBy($"split")
  }

  /** Dataset-card summary: the per-(lang, source) release table a corpus
    * publisher ships alongside a dataset drop — document and token mass,
    * exact-duplicate burden, short-doc burden, token-length range. Every
    * aggregate is an exact integer sum/min/max with at most ONE final
    * double division (rounded at 6), so the card is bit-stable
    * cross-engine and order-independent.
    *
    * Scale: exact-dup counting is one md5(text)-keyed agg (the identical
    * shuffle [[Dedup.exact]] already runs — at 100 TB the 16-byte digest
    * shuffles, never the text), one digest-keyed join back, then one
    * (lang, source) agg with map-side combine onto a handful of keys. */
  def datasetCard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"lang", $"source", md5($"text").as("h"),
        size(split($"text", " ")).cast("long").as("n_tok"))
    val dupCounts = docs.groupBy($"h").agg(count(lit(1)).as("copies"))
    docs.join(dupCounts, "h")
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        sum(when($"copies" > 1, 1L).otherwise(0L)).as("n_exact_dup_docs"),
        sum(when($"n_tok" < 20, 1L).otherwise(0L)).as("n_short_docs"),
        min($"n_tok").as("min_tokens"),
        max($"n_tok").as("max_tokens"))
      .withColumn("avg_doc_tokens",
        round($"n_tokens".cast("double") / $"n_docs", 6))
      .withColumn("dup_ratio",
        round($"n_exact_dup_docs".cast("double") / $"n_docs", 6))
      .orderBy($"lang", $"source")
  }

  private val TokenBudget = 2000L

  /** Token-budget quota sampling: each source contributes documents in a
    * DETERMINISTIC hash-shuffled priority order until its token budget
    * fills (a doc is taken while the tokens already taken are under
    * budget, so the budget-crossing doc is included and the sample is
    * never empty). This is the budget-driven counterpart of the
    * rate-driven [[domainMix]] — how a 100 TB corpus is cut to "at most
    * N tokens per domain" for a training mix, auditable and re-runnable
    * because priority is `hash(doc_id)`, not `rand()`.
    *
    * Scale: one window partitioned BY SOURCE over (hash, doc_id) — the
    * same per-shard independence as [[packSequences]]; nothing global.
    * The audit output is one partial-aggregated groupBy onto |sources|
    * keys. */
  def quotaSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bySource = Window.partitionBy($"source").orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"source", $"doc_id",
        size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("h", docHash)
      .withColumn("taken_before", coalesce(sum($"n_tok").over(bySource), lit(0L)))
      .withColumn("kept", ($"taken_before" < TokenBudget).cast("int"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"kept").cast("long").as("n_kept"),
        sum($"n_tok").as("tokens_total"),
        sum($"n_tok" * $"kept").as("tokens_kept"),
        round(sum($"n_tok" * $"kept").cast("double") / TokenBudget, 6)
          .as("budget_fill"))
      .orderBy($"source")
  }

  private val CompactTarget = 2000L // target compacted file size (bytes)

  /** Small-file compaction planning — the housekeeping job every 100 TB
    * table needs (a corpus written doc-at-a-time is millions of tiny
    * files; scan cost is dominated by file-open overhead until they are
    * coalesced): treat each document as a file of `n_chars` bytes and
    * greedily bin-pack, per source, files in id order into groups of
    * ~[[CompactTarget]] bytes — a file joins the group where its
    * EXCLUSIVE running sum lands (the streaming bin-pack rule: groups
    * can overshoot by at most one file, never undershoot by splitting).
    * The audit emits each planned group with its file count, byte mass,
    * id range, and fill ratio — what an OPTIMIZE/compaction committer
    * reviews before rewriting.
    *
    * Scale: one window PARTITIONED BY SOURCE over (doc_id) — the same
    * per-shard independence as [[packSequences]]/[[quotaSample]],
    * nothing global — then one partial agg onto group keys. */
  def compactFiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bySource = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("before", coalesce(sum($"n_chars").over(bySource), lit(0L)))
      .withColumn("grp", expr(s"CAST(before DIV $CompactTarget AS INT)"))
      .groupBy($"source", $"grp")
      .agg(
        count(lit(1)).as("n_files"),
        sum($"n_chars").as("bytes"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .withColumn("fill_ratio", round($"bytes" / lit(CompactTarget.toDouble), 4))
      .orderBy($"source", $"grp")
  }

  private val NEpochs = 3
  private val EpochMix = 1000003L // odd prime epoch offset inside the hash

  /** Deterministic per-epoch reshuffle audit — multi-epoch training
    * needs a DIFFERENT data order every epoch (same order twice trains
    * on correlated gradients) that is still reproducible from (doc_id,
    * epoch) alone (resume mid-epoch, re-derive any shard without a
    * stored permutation). The epoch is XOR-mixed INSIDE the
    * multiplicative hash (`(doc_id ⊕ epoch·p)·K mod 2³²`) — XOR, not
    * `+`: an additive offset cancels in the hash difference
    * (h(ep)−h(ep−1) = p·K for EVERY doc), making the "shuffle" a
    * constant shard rotation; this operator's own audit caught exactly
    * that (moved = 1.0 uniformly instead of ≈ (S−1)/S). The audit
    * emits, per (epoch, shard): doc/token mass (balance) and how many
    * docs moved shard vs the previous epoch (decorrelation — ≈ (S−1)/S
    * of docs should move; both moved ≈ 0 and moved ≈ 1.0-uniform are
    * broken mixes). The shard is the HIGH 4 bits of the 32-bit product
    * (Fibonacci hashing's actual contract — K is odd, so `% 16` of a
    * multiplicative hash is just the INPUT's low 4 bits, and any epoch
    * constant would flip every doc identically; the audit caught that
    * too, measured at moved = 1.0 uniform).
    *
    * Scale: shard and previous-epoch shard are PER-ROW expressions (no
    * join, no stored state); the explode is ×[[NEpochs]]; one partial
    * agg onto epochs × shards keys. At 100 TB this is the manifest
    * job that runs once per training run. */
  def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def shardOf(epSql: String) = expr(
      s"((CAST(doc_id AS BIGINT) ^ (($epSql) * $EpochMix)) * $HashMul)" +
        s" % $HashMod DIV ${HashMod / NShards}")
    Tables.documents(s, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("epoch", explode(array((0 until NEpochs).map(lit): _*)))
      .withColumn("shard", shardOf("epoch").cast("int"))
      .withColumn("moved",
        when($"epoch" === 0, 0)
          .otherwise((shardOf("epoch - 1") =!= shardOf("epoch")).cast("int")))
      .groupBy($"epoch", $"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("sum_tokens"),
        sum($"moved").cast("long").as("n_moved_in"))
      .orderBy($"epoch", $"shard")
  }

  private val MixBudget = 1000000L // total training-token budget

  /** Mixture-epoch planning — the data-mixing arithmetic a trainer runs
    * before a job (the DoReMi/Pile-style "how many epochs of each
    * domain" table): each source gets a target share of the token
    * budget proportional to its mixture weight; dividing by what the
    * source actually has yields its repeat factor (epochs), flagging
    * domains that must oversample (repeat > 1). Weights here cycle
    * 100/200/300/400 permille-like units by source index (a stand-in
    * for the user-supplied mixture config).
    *
    * Scale: one partially-aggregated groupBy(source) over (source,
    * n_tokens) pairs, then a broadcast scalar join for the weight
    * total — source cardinality is tiny at any corpus size, and the
    * corpus itself never reshuffles. All divisions are order-pinned
    * ((w·B)/W then /avail) so the oracle reproduces them exactly. */
  def mixEpochs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NULL text excluded on BOTH sides (oracle WHERE text IS NOT NULL),
    // the library's NULL-document convention (see blocklistScrub): an
    // all-NULL source would otherwise aggregate avail_tokens to NULL,
    // where Spark's (NULL > 1.0).cast("int") and the oracle's CASE WHEN
    // diverge (NULL vs 0).
    val perSrc = Tables.documents(s, dir)
      .where($"text".isNotNull)
      .groupBy($"source")
      .agg(sum(size(split($"text", " "))).cast("long").as("avail_tokens"))
      .withColumn("weight",
        (substring($"source", 4, 10).cast("int") % 4 + 1) * 100)
    val wTotal = broadcast(perSrc.agg(sum($"weight").cast("long").as("w_total")))
    perSrc.crossJoin(wTotal)
      .select(
        $"source", $"avail_tokens", $"weight",
        round(($"weight" * MixBudget).cast("double") / $"w_total", 6)
          .as("needed_tokens"),
        round((($"weight" * MixBudget).cast("double") / $"w_total")
          / $"avail_tokens", 6).as("repeat_factor"),
        ceil(round((($"weight" * MixBudget).cast("double") / $"w_total")
          / $"avail_tokens", 6)).cast("long").as("n_epochs"),
        (round((($"weight" * MixBudget).cast("double") / $"w_total")
          / $"avail_tokens", 6) > 1.0).cast("int").as("oversampled"))
      .orderBy($"source")
  }

  private val NStages = 4

  /** Curriculum staging: rank the corpus by quality score and cut it
    * into 4 equal-size stages (easy→hard curriculum order for training),
    * emitting the per-stage manifest (doc count, quality range, token
    * mass) a trainer consumes to schedule data. Stages follow SQL
    * `ntile` semantics over a DETERMINISTIC total order (round-6 score,
    * doc_id tie-break) — the DuckDB oracle pins them with a real NTILE —
    * so re-running the job reproduces the same stages.
    *
    * Scale: an UNPARTITIONED `ntile` window would funnel the whole
    * corpus through one partition (Spark's WindowExec requires each
    * window partition on a single task — with no PARTITION BY that is
    * ALL rows). Instead this is the exact distributed-ranking pattern
    * as ONE declarative query (single action, no persist, no driver
    * loop — the round-9 persist + count + rdd.zipWithIndex form cost 3
    * scheduled jobs and dropped out of codegen; it survives as the
    * [[curriculumZipIndex]] spec cross-check):
    *   1. range-partition ONLY the (doc_id, n_tokens, score) triple —
    *      never the text — and sort within partitions: partition i's
    *      rows all precede partition i+1's in the global order;
    *   2. `mapPartitions` numbers each partition locally (1-based);
    *   3. the exact global rank is local rank + the total count of all
    *      earlier partitions: per-partition counts are a tiny aggregate
    *      (≤ shuffle-partition rows), their exclusive prefix sum a
    *      broadcast triangular self-join — NOT a window, so the plan
    *      stays WindowExec-free at every size (Round9OpsSpec pins it);
    *   4. the NTILE bucket for a rank is pure arithmetic: with n rows
    *      and k stages the first n%k stages take ceil(n/k) rows, the
    *      rest floor(n/k).
    * Every branch (ranked rows, counts, total) reads the SAME range
    * exchange — Catalyst's ReuseExchange dedups it, so the quality scan
    * and the shuffle write happen once. */
  def curriculum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = TextOps.quality(s, dir)
      .select($"doc_id".cast("long"), $"n_tokens".cast("long"),
        $"quality_score")
    val parted = scored
      .repartitionByRange($"quality_score".asc, $"doc_id".asc)
      .sortWithinPartitions($"quality_score".asc, $"doc_id".asc)
      .as[(Long, Long, Double)]
    val local = parted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = 0L
      it.map { case (_, nTok, score) => i += 1; (pid, i, nTok, score) }
    }.toDF("pid", "lr", "n_tokens", "quality_score")
    // per-partition sizes (max local rank == count); ≤ one row per
    // shuffle partition, so everything below is broadcast-sized
    val counts = local.groupBy($"pid").agg(max($"lr").as("c"))
    val offs = counts
      .join(broadcast(counts.select($"pid".as("bpid"), $"c".as("bc"))),
        $"bpid" < $"pid", "left")
      .groupBy($"pid", $"c")
      .agg(coalesce(sum($"bc"), lit(0L)).as("off"))
      .select($"pid", $"off")
    val total = counts.agg(sum($"c").as("n"))
    local
      .join(broadcast(offs), "pid")
      .crossJoin(broadcast(total))
      .select($"n_tokens", $"quality_score", ($"lr" + $"off").as("r"), $"n")
      // ntile(k) arithmetic on the exact rank (integral `div` keeps the
      // math in longs; doubles would wobble past 2^53 ranks)
      .withColumn("stage", expr(
        s"""CAST(CASE WHEN n div $NStages = 0 THEN r
           |  WHEN r <= (n % $NStages) * (n div $NStages + 1)
           |    THEN (r - 1) div (n div $NStages + 1) + 1
           |  ELSE n % $NStages
           |    + (r - (n % $NStages) * (n div $NStages + 1) - 1)
           |      div (n div $NStages) + 1
           |END AS INT)""".stripMargin))
      .groupBy($"stage")
      .agg(
        count(lit(1)).as("n_docs"),
        min($"quality_score").as("min_quality"),
        max($"quality_score").as("max_quality"),
        sum($"n_tokens").cast("long").as("sum_tokens"))
      .orderBy($"stage")
  }

  /** The round-9 exact form of [[curriculum]] — range-partitioned total
    * sort + `rdd.zipWithIndex` global ranks — kept as the independent
    * cross-check Round9OpsSpec compares the shipped single-action plan
    * against (two implementations agreeing on exact NTILE membership is
    * a stronger pin than one). Eagerly executed: the persisted rank
    * triple is unpersisted before returning (the 4-row result is
    * re-wrapped as a local DataFrame), so no cache blocks outlive the
    * call. */
  private[graft] def curriculumZipIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = TextOps.quality(s, dir)
      .select($"doc_id".cast("long"), $"n_tokens".cast("long"),
        $"quality_score")
      .as[(Long, Long, Double)]
      .persist()
    try {
      val n = scored.count()
      val base = n / NStages
      val extra = n % NStages // first `extra` stages hold base+1 rows
      val cut = extra * (base + 1) // ranks 1..cut fall in the big stages
      val rows = scored
        .orderBy($"quality_score".asc, $"doc_id".asc)
        .rdd.zipWithIndex()
        .map { case ((_, nTokens, score), idx) =>
          val r = idx + 1 // 1-based global rank in the sorted order
          val stage =
            if (base == 0) r.toInt // degenerate n < NStages corpus
            else if (r <= cut) ((r - 1) / (base + 1) + 1).toInt
            else (extra + (r - cut - 1) / base + 1).toInt
          (stage, nTokens, score)
        }
        .toDF("stage", "n_tokens", "quality_score")
        .groupBy($"stage")
        .agg(
          count(lit(1)).as("n_docs"),
          min($"quality_score").as("min_quality"),
          max($"quality_score").as("max_quality"),
          sum($"n_tokens").cast("long").as("sum_tokens"))
        .orderBy($"stage")
        .collect()
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("stage", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("n_docs", org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("min_quality", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("max_quality", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("sum_tokens", org.apache.spark.sql.types.LongType))))
    } finally scored.unpersist()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_corpus_curation" -> (corpusCuration _),
    "pipe_curriculum"      -> (curriculum _),
    "pipe_mix_epochs"      -> (mixEpochs _),
    "pipe_quota_sample"    -> (quotaSample _),
    "pipe_domain_mix"      -> (domainMix _),
    "pipe_pack_sequences"  -> (packSequences _),
    "pipe_shard_assign"    -> (shardAssign _),
    "pipe_dataset_card"    -> (datasetCard _),
    "pipe_train_split"     -> (trainSplit _),
    "pipe_epoch_shuffle"   -> (epochShuffle _),
    "pipe_compact_files"   -> (compactFiles _),
  )

  // The oracle re-composes the SAME stages from the individual oracles'
  // CTEs: quality (TextOps), near-dup pairs (Dedup jaccard), anti join,
  // per-lang profile.
  override def oracles: Map[String, String] = Map(
    // Same exclusive running sum per source (ROWS ... 1 PRECEDING),
    // same integer group quotient, one pinned /target division.
    "pipe_compact_files" ->
      s"""WITH f AS (
         |  SELECT source, doc_id, n_chars,
         |         COALESCE(sum(n_chars) OVER (
         |           PARTITION BY source ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |  FROM documents
         |)
         |SELECT source, CAST(before // $CompactTarget AS INT) AS grp,
         |       count(*) AS n_files,
         |       CAST(sum(n_chars) AS BIGINT) AS bytes,
         |       min(doc_id) AS first_doc,
         |       max(doc_id) AS last_doc,
         |       round(CAST(sum(n_chars) AS BIGINT) / ${CompactTarget}.0, 4)
         |         AS fill_ratio
         |FROM f GROUP BY source, grp
         |ORDER BY source, grp""".stripMargin,
    // Same epoch-mixed multiplicative hash, same per-row previous-epoch
    // shard re-derivation; pure integer arithmetic throughout.
    "pipe_epoch_shuffle" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents
         |), x AS (
         |  SELECT doc_id, n_tok, ep,
         |         ((xor(doc_id, ep * $EpochMix) * $HashMul) % $HashMod)
         |           // ${HashMod / NShards} AS shard,
         |         CASE WHEN ep = 0 THEN 0 WHEN
         |           ((xor(doc_id, (ep - 1) * $EpochMix) * $HashMul) % $HashMod)
         |             // ${HashMod / NShards}
         |           <> ((xor(doc_id, ep * $EpochMix) * $HashMul) % $HashMod)
         |              // ${HashMod / NShards}
         |         THEN 1 ELSE 0 END AS moved
         |  FROM d, unnest(generate_series(0, ${NEpochs - 1})) AS g(ep)
         |)
         |SELECT CAST(ep AS INT) AS epoch, CAST(shard AS INT) AS shard,
         |       count(*) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
         |       CAST(sum(moved) AS BIGINT) AS n_moved_in
         |FROM x GROUP BY ep, shard
         |ORDER BY epoch, shard""".stripMargin,
    // Same multiplicative-hash 80/10/10 bucketing; leakage via the same
    // md5(text) digest both engines compute over UTF-8 text.
    "pipe_train_split" ->
      s"""WITH d AS (
         |  SELECT doc_id, md5(text) AS h,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |         CASE WHEN $hashSql % 10 <= 7 THEN 'train'
         |              WHEN $hashSql % 10 = 8 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM documents WHERE text IS NOT NULL
         |), s AS (SELECT h, count(DISTINCT split) AS n_splits FROM d GROUP BY h)
         |SELECT split, count(*) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_leaked_docs,
         |       round(CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |             / count(*), 6) AS leak_ratio
         |FROM d JOIN s USING (h)
         |GROUP BY split
         |ORDER BY split""".stripMargin,
    // Integer sums + one rounded division per ratio; dup membership via
    // the same md5(text) digest both engines compute over UTF-8 text.
    "pipe_dataset_card" ->
      """WITH d AS (
        |  SELECT lang, source, md5(text) AS h,
        |         len(string_split(text, ' ')) AS n_tok
        |  FROM documents
        |), c AS (SELECT h, count(*) AS copies FROM d GROUP BY 1)
        |SELECT lang, source,
        |       count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_exact_dup_docs,
        |       CAST(sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_short_docs,
        |       min(n_tok) AS min_tokens,
        |       max(n_tok) AS max_tokens,
        |       round(CAST(sum(n_tok) AS DOUBLE) / count(*), 6)
        |         AS avg_doc_tokens,
        |       round(CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS dup_ratio
        |FROM d JOIN c USING (h)
        |GROUP BY 1, 2
        |ORDER BY lang, source""".stripMargin,
    "pipe_corpus_curation" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         len(string_split(text, ' ')) AS n_tokens,
         |         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |         len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) AS n_stop
         |  FROM documents
         |), q AS (
         |  SELECT doc_id, n_tokens,
         |         round(0.4 * (n_distinct / n_tokens)
         |             + 0.3 * (1.0 - n_stop / n_tokens)
         |             + 0.3 * least(n_tokens / 50.0, 1.0), 6) AS quality_score
         |  FROM t
         |), tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |d AS (
         |  SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(tk) - 2, 1)),
         |         i -> array_to_string(tk[i:i+2], ' '))) AS shingles
         |  FROM tok
         |), e AS (
         |  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM d
         |), losers AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
         |  HAVING round(count(*) / (a.n_sh + b.n_sh - count(*)), 6) >= 0.8
         |)
         |SELECT doc.lang, count(*) AS n_docs,
         |       CAST(sum(q.n_tokens) AS BIGINT) AS sum_tokens,
         |       round(CAST(sum(q.n_tokens) AS DOUBLE) / count(*), 6) AS avg_tokens,
         |       min(q.quality_score) AS min_quality,
         |       max(q.quality_score) AS max_quality
         |FROM documents doc
         |JOIN q ON doc.doc_id = q.doc_id
         |WHERE q.quality_score >= $qualityThreshold
         |  AND doc.doc_id NOT IN (SELECT doc_id FROM losers)
         |GROUP BY doc.lang
         |ORDER BY doc.lang""".stripMargin,
    // Same order-pinned division chain ((w·B)/W then /avail); ceil on
    // the ROUNDED repeat factor in both engines.
    "pipe_mix_epochs" ->
      s"""WITH d AS (
         |  SELECT source, CAST(substring(source, 4, 10) AS INT) AS src_num,
         |         len(string_split(text, ' ')) AS n_tok
         |  FROM documents WHERE text IS NOT NULL
         |), a AS (
         |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS avail_tokens,
         |         (min(src_num) % 4 + 1) * 100 AS weight
         |  FROM d GROUP BY source
         |), w AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM a)
         |SELECT source, avail_tokens, weight,
         |       round(CAST(weight * $MixBudget AS DOUBLE) / w_total, 6) AS needed_tokens,
         |       round((CAST(weight * $MixBudget AS DOUBLE) / w_total)
         |             / avail_tokens, 6) AS repeat_factor,
         |       CAST(ceil(round((CAST(weight * $MixBudget AS DOUBLE) / w_total)
         |             / avail_tokens, 6)) AS BIGINT) AS n_epochs,
         |       CASE WHEN round((CAST(weight * $MixBudget AS DOUBLE) / w_total)
         |             / avail_tokens, 6) > 1.0 THEN 1 ELSE 0 END AS oversampled
         |FROM a CROSS JOIN w ORDER BY source""".stripMargin,
    "pipe_domain_mix" ->
      s"""WITH d AS (
         |  SELECT source, CAST(substring(source, 4, 10) AS INT) AS src_num,
         |         $hashSql AS h
         |  FROM documents
         |), m AS (
         |  SELECT source, (src_num % 4 + 1) * 250 AS rate_permille,
         |         CASE WHEN h % 1000 < (src_num % 4 + 1) * 250 THEN 1 ELSE 0 END AS kept
         |  FROM d
         |)
         |SELECT source,
         |       min(rate_permille) AS rate_permille,
         |       count(*) AS n_before,
         |       CAST(sum(kept) AS BIGINT) AS n_after,
         |       round(sum(kept) / count(*), 6) AS achieved_rate
         |FROM m GROUP BY source ORDER BY source""".stripMargin,
    "pipe_pack_sequences" ->
      s"""WITH d AS (
         |  SELECT source, doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents
         |), w AS (
         |  SELECT source, doc_id, n_tok,
         |         CAST(COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM d
         |), x AS (
         |  SELECT source, n_tok, off,
         |         off // $SeqLen AS first_seq,
         |         (off + n_tok - 1) // $SeqLen AS last_seq
         |  FROM w
         |), e AS (
         |  SELECT source, n_tok, off,
         |         unnest(generate_series(first_seq, last_seq)) AS seq_id
         |  FROM x
         |)
         |SELECT source, seq_id,
         |       count(*) AS n_docs,
         |       CAST(sum(least((seq_id + 1) * $SeqLen, off + n_tok)
         |                - greatest(seq_id * $SeqLen, off)) AS BIGINT) AS n_tokens
         |FROM e GROUP BY source, seq_id
         |ORDER BY source, seq_id""".stripMargin,
    "pipe_shard_assign" ->
      s"""WITH d AS (
         |  SELECT *, CAST($hashSql // ${HashMod / NShards} AS INT) AS shard
         |  FROM documents
         |)
         |SELECT shard,
         |       count(*) AS n_docs,
         |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
         |       count(DISTINCT source) AS n_sources,
         |       min(doc_id) AS min_doc_id,
         |       max(doc_id) AS max_doc_id
         |FROM d GROUP BY shard ORDER BY shard""".stripMargin,
    // Same quality CTE as pipe_corpus_curation; ntile over the identical
    // (score, doc_id) total order yields identical stage membership.
    "pipe_curriculum" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         len(string_split(text, ' ')) AS n_tokens,
         |         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |         len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) AS n_stop
         |  FROM documents
         |), q AS (
         |  SELECT doc_id, n_tokens,
         |         round(0.4 * (n_distinct / n_tokens)
         |             + 0.3 * (1.0 - n_stop / n_tokens)
         |             + 0.3 * least(n_tokens / 50.0, 1.0), 6) AS quality_score
         |  FROM t
         |), staged AS (
         |  SELECT n_tokens, quality_score,
         |         ntile($NStages) OVER (ORDER BY quality_score ASC, doc_id ASC) AS stage
         |  FROM q
         |)
         |SELECT stage, count(*) AS n_docs,
         |       min(quality_score) AS min_quality,
         |       max(quality_score) AS max_quality,
         |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM staged GROUP BY stage ORDER BY stage""".stripMargin,
    // Same hash priority, same strict-before-budget keep rule; integer
    // token arithmetic until the one final rounded division.
    "pipe_quota_sample" ->
      s"""WITH d AS (
         |  SELECT source, doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |         $hashSql AS h
         |  FROM documents
         |), w AS (
         |  SELECT source, n_tok,
         |         CAST(COALESCE(sum(n_tok) OVER (PARTITION BY source
         |             ORDER BY h, doc_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS taken_before
         |  FROM d
         |), k AS (
         |  SELECT source, n_tok,
         |         CASE WHEN taken_before < $TokenBudget THEN 1 ELSE 0 END AS kept
         |  FROM w
         |)
         |SELECT source,
         |       count(*) AS n_docs,
         |       CAST(sum(kept) AS BIGINT) AS n_kept,
         |       CAST(sum(n_tok) AS BIGINT) AS tokens_total,
         |       CAST(sum(n_tok * kept) AS BIGINT) AS tokens_kept,
         |       round(CAST(sum(n_tok * kept) AS DOUBLE) / $TokenBudget, 6)
         |         AS budget_fill
         |FROM k GROUP BY source ORDER BY source""".stripMargin,
  )
}
