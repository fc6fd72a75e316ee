package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_corpus_curation" -> (corpusCuration _),
  )

  // The oracle re-composes the SAME stages from the individual oracles'
  // CTEs: quality (TextOps), near-dup pairs (Dedup jaccard), anti join,
  // per-lang profile.
  override def oracles: Map[String, String] = Map(
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
  )
}
