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

  /** Exact vs HLL distinct counts per event type. No oracle for the HLL
    * column (engine-specific sketch); SketchSpec bounds its error. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("exact_users"),
        approx_count_distinct($"user_id").as("approx_users"))
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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_approx_distinct" -> (approxDistinct _),
    "sketch_quantiles"       -> (quantiles _),
    "sketch_summary_stats"   -> (summaryStats _),
    "sketch_topk_freq"       -> (topkFreq _),
  )

  override def oracles: Map[String, String] = Map(
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
  )
}
