package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by [[QueryModule]]s (one per operator family);
  * this object only merges them. Every query key has a matching DuckDB
  * oracle in [[oracleSql]] unless the operator is not SQL-expressible
  * (then the driver records a weaker rows-only check).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    Relational,
    EventOps,
    TextOps,
    Dedup,
    Similarity,
    Multimodal,
    Sketches,
    Pipelines,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composite curation pipeline exercises text scoring, the
    * prefix-filtered near-dup join, and the aggregation layer in one
    * declarative job — the engine's character in a single query. */
  def entry(spark: SparkSession): DataFrame =
    Pipelines.corpusCuration(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
