package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.StatsAggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate and custom aggregation operators — what replaces exact
  * distinct/quantile/stats at 100 TB:
  *
  *   - HLL approx distinct (`approx_count_distinct`): one pass, fixed
  *     memory, vs `countDistinct`'s expand+exchange;
  *   - exact interpolated percentiles (`percentile`) — oracle-checkable
  *     against DuckDB's `quantile_cont`, and the correctness baseline the
  *     approximate `percentile_approx` is judged against in spec;
  *   - a typed [[graft.functions.StatsAggregator]] (custom `Aggregator`
  *     API) computing one-pass summary stats, oracle-checked.
  */
object Sketches extends QueryModule {

  /** Exact distinct users per event type — the oracle-checked baseline the
    * HLL estimate is judged against. countDistinct plans as a two-phase
    * expand+exchange; at 100 TB swap to [[approxDistinct]] (constant
    * memory) when ±2% is acceptable. */
  def exactDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
      .orderBy($"event_type")
  }

  /** Exact vs HLL distinct counts per event type, hash-gated as an
    * ENGINE-AGREEMENT contract (VERDICT r9 #7): the raw HLL estimate is
    * engine-specific (DuckDB runs a different sketch), so instead of the
    * estimate itself the query emits `approx_within_5pct` — computed in
    * Spark from the REAL `approx_count_distinct` estimate — and the
    * oracle emits the constant truth it asserts. If Spark's HLL ever
    * drifts past the 5% bound the flag flips to 0, the hash diverges,
    * and the driver's gate catches the regression; the raw estimate's
    * value is additionally bounded in SketchSpec. The exact column is
    * hash-gated directly (and via [[exactDistinct]]).
    *
    * The sketch runs at rsd=0.015 (one standard deviation) so the
    * asserted 5% bound sits at 3.3σ — deterministic headroom, not a
    * coin flip on regenerated testdata (ADVICE r10: the default
    * rsd 0.05 made the 5% bound a 1σ assertion that a new SF could
    * deterministically violate for some group; the advice's suggested
    * floor was 3σ). The r11 first cut used rsd 0.01 (5σ), but the p=14
    * register file made the agg buffer the dominant cost (measured
    * 0.7–0.9 s of pure sketch overhead at sf0.1 vs ~0.2 s at p=13 —
    * buffer copy/merge scales with the 13 KB-per-group rows, not with
    * input); 3.3σ keeps the gate sound at half the buffer.
    *
    * Plan shape: `distinct` FIRST, then one plain aggregate. Mixing
    * `countDistinct` and the sketch in a single agg plans an Expand with
    * a multi-phase distinct aggregation, and the 1.6k-word HLL buffer
    * gets carried (copied, serialized, merged) through every phase —
    * measured 2.0 s vs 0.4 s at sf0.1 for identical output. HLL registers
    * depend only on the SET of hashed inputs, so the estimate over the
    * deduped rows is bit-identical to the estimate over the raw rows,
    * `count(*)` over them IS the exact distinct count, and the whole
    * query is one scan + one hash-distinct + one partial-aggregated agg
    * with no Expand. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type", $"user_id").distinct()
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("exact_users"),
        approx_count_distinct($"user_id", 0.015).as("approx_users"))
      .select($"event_type", $"exact_users",
        (abs($"approx_users" - $"exact_users") <=
          $"exact_users".cast("double") * 0.05).cast("int").as("approx_within_5pct"))
      .orderBy($"event_type")
  }

  /** Exact interpolated percentiles of `value` per event type. */
  def quantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy($"event_type")
  }

  /** One-pass summary stats through the custom typed Aggregator. */
  def summaryStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type", $"value")
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(StatsAggregator.of.toColumn.name("stats"))
      .select(
        col("key").as("event_type"),
        col("stats.count").as("n"),
        round(col("stats.sum"), 2).as("value_sum"),
        round(col("stats.min"), 2).as("value_min"),
        round(col("stats.max"), 2).as("value_max"))
      .orderBy(col("event_type"))
  }

  /** Heavy hitters: top-10 users by event volume (exact groupBy + top-k;
    * the orderBy+limit plans as TakeOrderedAndProject — per-partition
    * heaps, no global sort). At 100 TB the same query runs unchanged; the
    * approximate alternative (count-min + candidate verify) only matters
    * when the KEY cardinality itself can't be aggregated, which a
    * (user_id → count) map rarely hits. Ties broken by user_id so the cut
    * at k is deterministic. */
  def topkFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
           countDistinct($"event_type").as("n_types"))
      .orderBy($"n_events".desc, $"user_id".asc)
      .limit(10)
  }

  // Count-min sketch parameters: d=4 rows × w=64 buckets, universal hashes
  // h_j(u) = ((a_j·u + b_j) mod P) mod w with fixed-seed LCG constants —
  // fully deterministic, so unlike most sketches the ESTIMATES themselves
  // are oracle-checkable (DuckDB rebuilds the identical counter matrix).
  private val CmsP = 2147483647L
  private val CmsW = 64
  private val CmsD = 4
  private def lcg(x: Long): Long =
    (x * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffffffffffL
  private val cmsA = Array.tabulate(CmsD)(j => (lcg(3 * j + 5) % (CmsP - 1)) + 1)
  private val cmsB = Array.tabulate(CmsD)(j => lcg(3 * j + 6) % CmsP)

  /** Count-min frequency estimates for the probe keys (user_id < 10), next
    * to their exact counts. The relational formulation IS the distributed
    * CMS build: groupBy (row, bucket) = the d×w counter matrix, sharded
    * and map-side combined; the probe join is a broadcast of d·w = 256
    * rows. At 100 TB the matrix size is CONSTANT — that is the point of
    * the sketch — while the exact count's state grows with key
    * cardinality. Estimate = min over rows, always ≥ exact (one-sided
    * error), SketchSpec asserts the bound. */
  def cmsFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def bucket(j: Int, c: org.apache.spark.sql.Column) =
      (c * cmsA(j) + cmsB(j)) % CmsP % CmsW
    def probes(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
      df.select(cols :+ explode(array((0 until CmsD).map(j =>
          struct(lit(j).as("j"), bucket(j, col("user_id")).as("bkt"))): _*)).as("jb"): _*)
        .withColumn("j", $"jb.j").withColumn("bkt", $"jb.bkt").drop("jb")
    val counters = probes(Tables.events(s, dir).select($"user_id"), $"user_id")
      .groupBy($"j", $"bkt").agg(count(lit(1)).as("cnt"))
    val exact = Tables.events(s, dir).where($"user_id" < 10)
      .groupBy($"user_id").agg(count(lit(1)).as("exact_n"))
    probes(exact, $"user_id", $"exact_n")
      .join(counters, Seq("j", "bkt"))
      .groupBy($"user_id", $"exact_n")
      .agg(min($"cnt").as("cms_n"))
      .select($"user_id", $"exact_n", $"cms_n")
      .orderBy($"user_id")
  }

  // Zone-map audit granularity: one logical block per 250 orderkeys
  // (~1k lineitem rows at sf0.01) and the ship-date cutoffs a pruning
  // report is evaluated at.
  private val BlockKeys = 250
  private val PruneCutoffs = Seq("1997-01-01", "1999-01-01", "2001-01-01")

  /** Zone-map (block min/max) pruning audit: build the per-block
    * min/max/count index over `l_shipdate` that every columnar format
    * keeps (parquet row-group stats, ORC stripe stats, Iceberg/Delta
    * file stats), then measure — for each candidate predicate cutoff —
    * what fraction of blocks and rows `l_shipdate >= cutoff` could skip
    * without reading data. This is the report that tells you whether a
    * corpus is worth re-clustering: on date-ordered data pruning
    * approaches 100%; on this hash-ordered synthetic data it exposes
    * near-zero skipping, which is exactly the signal.
    *
    * Scale: the index build is one scan + one agg onto n_rows/BlockKeys
    * keys (map-side combined); the audit crosses that index with a
    * constant cutoff list — at 100 TB the index is ~file-count-sized and
    * the audit runs on stats alone, the same reason engines answer these
    * queries from metadata without touching data. */
  def blockPruning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blocks = Tables.lineitem(s, dir)
      .select(expr(s"l_orderkey div $BlockKeys").as("block"), $"l_shipdate")
      .groupBy($"block")
      .agg(min($"l_shipdate").as("min_ship"), max($"l_shipdate").as("max_ship"),
           count(lit(1)).as("n_rows"))
    val cutoffs = PruneCutoffs.toDF("cutoff_s")
      .select(to_timestamp($"cutoff_s").as("cutoff"))
    blocks.crossJoin(broadcast(cutoffs))
      .groupBy($"cutoff")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when($"max_ship" < $"cutoff", 1L).otherwise(0L)).as("n_blocks_pruned"),
        sum($"n_rows").as("n_rows_total"),
        sum(when($"max_ship" < $"cutoff", $"n_rows").otherwise(0L)).as("n_rows_pruned"),
        round(sum(when($"max_ship" < $"cutoff", 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("block_prune_ratio"))
      .orderBy($"cutoff")
  }

  /** Mergeable-sketch distinct counting (`hll_sketch_agg` /
    * `hll_union_agg`) — the property that makes approximate distinct
    * WORK at 100 TB: per-group sketches are built in one pass (partial
    * aggregation combines map-side) and then UNIONED into coarser
    * scopes without touching the data again — the re-aggregation every
    * "distinct users by X, and overall" dashboard needs, impossible
    * with exact distinct (which must re-shuffle raw keys per scope).
    * Emits per event_type and for the unioned ALL scope the exact
    * count and the engine-agreement bound flag (the
    * [[approxDistinct]] contract: DuckDB runs a different sketch, so
    * the oracle checks the exact column and asserts the flag).
    * lgConfigK=14 (16k buckets, rsd≈0.8%) puts the asserted 5% bound
    * at ≈6σ so the gate never flips on resampled data. */
  def hllUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perType = Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id", 14).as("sk"),
        countDistinct($"user_id").as("exact_users"))
      .persist()
    val overallExact = Tables.events(s, dir)
      .agg(countDistinct($"user_id").as("exact_users"))
    val overall = perType.agg(hll_union_agg($"sk").as("sk"))
      .crossJoin(broadcast(overallExact))
      .select(lit("ALL").as("scope"), $"sk", $"exact_users")
    perType.select($"event_type".as("scope"), $"sk", $"exact_users")
      .unionByName(overall)
      .select($"scope", $"exact_users",
        (abs(hll_sketch_estimate($"sk") - $"exact_users") <=
          $"exact_users".cast("double") * 0.05).cast("int").as("approx_within_5pct"))
      .orderBy($"scope")
  }

  // Z-order audit granularity: 16 quantization levels per dimension
  // (4 bits), 16 consecutive cells per block in each layout, and the
  // 2-D probe rectangles (in bucket space) the layouts are compared on.
  private val ZLevels = 16
  private val ZCellsPerBlock = 16
  private val ZProbes = Seq(
    // (probe, ulo, uhi, vlo, vhi)
    ("center",   6, 9,  6, 9),
    ("point",    5, 5,  5, 5),
    ("quadrant", 8, 15, 8, 15),
    ("u_band",   3, 4,  0, 15),
    ("v_band",   0, 15, 3, 4))

  /** Z-order vs linear clustering audit — the multi-dimensional layout
    * decision behind Delta/Iceberg `OPTIMIZE ZORDER`: quantize
    * `(user_id, value)` to a [[ZLevels]]×[[ZLevels]] grid, interleave
    * the bucket bits into a Morton z-value, and compare zone-map
    * pruning (the [[blockPruning]] machinery) between a user-major
    * linear layout and the z-order layout on the SAME 2-D probe
    * rectangles. Linear blocks span one user stripe each — any
    * value-only predicate scans ALL of them; z-order blocks are 4×4
    * spatial tiles, so BOTH dimensions prune. The output is the
    * evidence table for a re-clustering decision: per (probe, layout),
    * blocks/rows a zone-map-respecting scan must touch vs rows that
    * actually match.
    *
    * Scale: bucketing and bit-interleave are per-row expressions (the
    * write path at 100 TB is `repartitionByRange(z)` + in-partition
    * sort — no new machinery); block stats are one partial agg onto
    * n_cells/[[ZCellsPerBlock]] keys; the audit crosses STATS with a
    * constant probe list, answered from metadata like every zone-map
    * query. Quantization bounds come from one scalar agg broadcast —
    * integer arithmetic for user_id, one order-pinned division for
    * value, so both engines land in identical buckets. */
  def zorderPruning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ext = broadcast(Tables.events(s, dir).agg(
      min($"user_id").as("umin"), max($"user_id").as("umax"),
      min($"value").as("vmin"), max($"value").as("vmax")))
    // persisted: three consumers (two block-stats layouts + the match
    // counts) would each re-scan events and re-derive the extents agg;
    // harness-managed lifecycle (see Dedup)
    val bucketed = Tables.events(s, dir).select($"user_id", $"value")
      .crossJoin(ext)
      .withColumn("ub", expr(
        s"CAST(((user_id - umin) * $ZLevels) DIV (umax - umin + 1) AS INT)"))
      .withColumn("vb", expr(
        s"""CASE WHEN vmax = vmin THEN 0 ELSE
           |  LEAST(CAST(FLOOR((value - vmin) / ((vmax - vmin) / $ZLevels.0)) AS INT),
           |        ${ZLevels - 1}) END""".stripMargin))
      .withColumn("z", (0 until 4).map(i =>
        shiftleft(shiftright($"ub", i).bitwiseAND(lit(1)), 2 * i + 1) +
          shiftleft(shiftright($"vb", i).bitwiseAND(lit(1)), 2 * i))
        .reduce(_ + _))
      .persist()
    // r22 (guide §2.3/§2.4): both layouts' block stats come out of ONE
    // pass and ONE (block, layout)-keyed partial-agg shuffle — each row
    // explodes into its two (layout, block) assignments — where the old
    // union of two groupBys scanned the cached relation twice and
    // shuffled twice. Row set identical (same groups, same aggregates).
    val stats = bucketed
      .select(explode(array(
          struct(lit("linear").as("layout"), $"ub".cast("bigint").as("block")),
          struct(lit("zorder").as("layout"),
            expr(s"z DIV $ZCellsPerBlock").cast("bigint").as("block")))).as("lb"),
        $"ub", $"vb")
      .groupBy($"lb.block".as("block"), $"lb.layout".as("layout"))
      .agg(min($"ub").as("minu"), max($"ub").as("maxu"),
           min($"vb").as("minv"), max($"vb").as("maxv"),
           count(lit(1)).as("n_rows"))
    val probes = broadcast(
      ZProbes.toDF("probe", "ulo", "uhi", "vlo", "vhi"))
    val hit = $"maxu" >= $"ulo" && $"minu" <= $"uhi" &&
      $"maxv" >= $"vlo" && $"minv" <= $"vhi"
    val matches = bucketed.crossJoin(probes)
      .where($"ub".between($"ulo", $"uhi") && $"vb".between($"vlo", $"vhi"))
      .groupBy($"probe").agg(count(lit(1)).as("n_rows_match"))
    stats.crossJoin(probes)
      .groupBy($"probe", $"layout")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(hit, 1L).otherwise(0L)).as("n_blocks_scanned"),
        sum(when(hit, $"n_rows").otherwise(0L)).as("n_rows_scanned"))
      .join(matches, Seq("probe"), "left")
      .withColumn("n_rows_match", coalesce($"n_rows_match", lit(0L)))
      .orderBy($"probe", $"layout")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_exact_distinct"  -> (exactDistinct _),
    "sketch_block_pruning"   -> (blockPruning _),
    "sketch_zorder_pruning"  -> (zorderPruning _),
    "sketch_hll_union"       -> (hllUnion _),
    "sketch_approx_distinct" -> (approxDistinct _),
    "sketch_quantiles"       -> (quantiles _),
    "sketch_summary_stats"   -> (summaryStats _),
    "sketch_topk_freq"       -> (topkFreq _),
    "sketch_cms_freq"        -> (cmsFreq _),
  )

  override def oracles: Map[String, String] = Map(
    "sketch_exact_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Engine-agreement gate: the oracle re-derives the exact column and
    // ASSERTS the 5% bound (constant 1) — Spark computes the flag from
    // its real HLL estimate, so an out-of-bound estimate flips the flag
    // and fails the hash compare.
    "sketch_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |       1 AS approx_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Engine-agreement contract as sketch_approx_distinct: exact counts
    // re-derived per scope (types + ALL), bound flag asserted constant.
    "sketch_hll_union" ->
      """SELECT event_type AS scope, count(DISTINCT user_id) AS exact_users,
        |       1 AS approx_within_5pct
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT 'ALL', count(DISTINCT user_id), 1 FROM events
        |ORDER BY scope""".stripMargin,
    "sketch_quantiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.95), 6) AS p95,
        |       round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sketch_summary_stats" ->
      """SELECT event_type,
        |       count(*) AS n,
        |       round(sum(value), 2) AS value_sum,
        |       round(min(value), 2) AS value_min,
        |       round(max(value), 2) AS value_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sketch_topk_freq" ->
      """SELECT user_id, count(*) AS n_events,
        |       count(DISTINCT event_type) AS n_types
        |FROM events
        |GROUP BY user_id
        |ORDER BY n_events DESC, user_id ASC
        |LIMIT 10""".stripMargin,
    "sketch_cms_freq" ->
      s"""WITH h AS (SELECT * FROM (VALUES
         |  ${(0 until CmsD).map(j => s"($j, ${cmsA(j)}, ${cmsB(j)})").mkString(", ")}
         |) AS t(j, a, b)),
         |r AS (
         |  SELECT e.user_id, h.j,
         |         ((e.user_id * h.a + h.b) % $CmsP) % $CmsW AS bkt
         |  FROM events e CROSS JOIN h
         |),
         |counters AS (SELECT j, bkt, count(*) AS cnt FROM r GROUP BY 1, 2),
         |exact AS (SELECT user_id, count(*) AS exact_n FROM events
         |          WHERE user_id < 10 GROUP BY 1),
         |probes AS (
         |  SELECT x.user_id, x.exact_n, h.j,
         |         ((x.user_id * h.a + h.b) % $CmsP) % $CmsW AS bkt
         |  FROM exact x CROSS JOIN h
         |)
         |SELECT p.user_id, p.exact_n, min(c.cnt) AS cms_n
         |FROM probes p JOIN counters c ON p.j = c.j AND p.bkt = c.bkt
         |GROUP BY 1, 2
         |ORDER BY user_id""".stripMargin,
    "sketch_block_pruning" ->
      s"""WITH blocks AS (
         |  SELECT l_orderkey // $BlockKeys AS block,
         |         min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
         |         count(*) AS n_rows
         |  FROM lineitem GROUP BY 1
         |), cutoffs AS (
         |  SELECT CAST(c AS TIMESTAMP) AS cutoff
         |  FROM (VALUES ${PruneCutoffs.map(c => s"('$c')").mkString(", ")}) AS t(c)
         |)
         |SELECT cutoff,
         |       count(*) AS n_blocks,
         |       CAST(sum(CASE WHEN max_ship < cutoff THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_blocks_pruned,
         |       CAST(sum(n_rows) AS BIGINT) AS n_rows_total,
         |       CAST(sum(CASE WHEN max_ship < cutoff THEN n_rows ELSE 0 END) AS BIGINT)
         |         AS n_rows_pruned,
         |       round(CAST(sum(CASE WHEN max_ship < cutoff THEN 1 ELSE 0 END) AS DOUBLE)
         |             / count(*), 6) AS block_prune_ratio
         |FROM blocks CROSS JOIN cutoffs
         |GROUP BY cutoff ORDER BY cutoff""".stripMargin,
    // Same integer user-bucket quotient, same order-pinned value-bucket
    // division ((v - vmin) / ((vmax - vmin) / 16.0)), same Morton bit
    // interleave — both engines land every row in the identical cell.
    "sketch_zorder_pruning" ->
      s"""WITH ext AS (
         |  SELECT min(user_id) AS umin, max(user_id) AS umax,
         |         min(value) AS vmin, max(value) AS vmax
         |  FROM events
         |), b AS (
         |  SELECT CAST(((user_id - umin) * $ZLevels) // (umax - umin + 1) AS INT) AS ub,
         |         CASE WHEN vmax = vmin THEN 0 ELSE
         |           LEAST(CAST(FLOOR((value - vmin) / ((vmax - vmin) / $ZLevels.0)) AS INT),
         |                 ${ZLevels - 1}) END AS vb
         |  FROM events CROSS JOIN ext
         |), zb AS (
         |  SELECT ub, vb,
         |         ((ub >> 0) & 1) * 2   + ((vb >> 0) & 1) * 1
         |       + ((ub >> 1) & 1) * 8   + ((vb >> 1) & 1) * 4
         |       + ((ub >> 2) & 1) * 32  + ((vb >> 2) & 1) * 16
         |       + ((ub >> 3) & 1) * 128 + ((vb >> 3) & 1) * 64 AS z
         |  FROM b
         |), stats AS (
         |  SELECT 'linear' AS layout, ub AS block,
         |         min(ub) AS minu, max(ub) AS maxu,
         |         min(vb) AS minv, max(vb) AS maxv, count(*) AS n_rows
         |  FROM zb GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'zorder', z // $ZCellsPerBlock,
         |         min(ub), max(ub), min(vb), max(vb), count(*)
         |  FROM zb GROUP BY 1, 2
         |), p(probe, ulo, uhi, vlo, vhi) AS (
         |  VALUES ${ZProbes.map { case (n, a, b2, c, d) =>
                      s"('$n', $a, $b2, $c, $d)" }.mkString(",\n         |         ")}
         |), m AS (
         |  SELECT probe, count(*) AS n_rows_match
         |  FROM zb CROSS JOIN p
         |  WHERE ub BETWEEN ulo AND uhi AND vb BETWEEN vlo AND vhi
         |  GROUP BY probe
         |)
         |SELECT s.probe, s.layout, s.n_blocks, s.n_blocks_scanned,
         |       s.n_rows_scanned, COALESCE(m.n_rows_match, 0) AS n_rows_match
         |FROM (
         |  SELECT probe, layout, count(*) AS n_blocks,
         |         CAST(sum(CASE WHEN maxu >= ulo AND minu <= uhi
         |                        AND maxv >= vlo AND minv <= vhi
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_blocks_scanned,
         |         CAST(sum(CASE WHEN maxu >= ulo AND minu <= uhi
         |                        AND maxv >= vlo AND minv <= vhi
         |                  THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_scanned
         |  FROM stats CROSS JOIN p
         |  GROUP BY probe, layout
         |) s LEFT JOIN m ON s.probe = m.probe
         |ORDER BY s.probe, s.layout""".stripMargin,
  )
}
