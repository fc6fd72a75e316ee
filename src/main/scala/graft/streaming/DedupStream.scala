package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental dedup: every micro-batch of newly ingested
  * documents is screened against the corpus at rest, emitting the exact
  * 3-gram-Jaccard ≥ 0.8 pairs it forms with existing documents — the
  * streaming form of [[Dedup.incremental]], and the shape a production
  * ingest pipeline actually runs (the reference is a streaming system:
  * `Task2.py:36-42` readStream → transform → sink).
  *
  * Scale design:
  *   - the corpus index ([[corpusIndex]]) is built ONCE and persisted —
  *     at rest it is a complete shingle posting list, the relation a
  *     pre-bucketed index table would serve;
  *   - per micro-batch work scales with the BATCH: only the batch's rare
  *     prefix explodes (PPJoin one-sided guarantee — a qualifying pair's
  *     witness shingle must sit in the batch doc's prefix, so joining it
  *     against the corpus's FULL posting list loses nothing);
  *   - `maxDf` drops corpus-wide hot shingles from both sides
  *     consistently, exactly as in the batch twin.
  *
  * StreamingOpsSpec pins stream == batch: feeding the odd-id documents
  * through micro-batches against the even-id corpus emits exactly the
  * rows of the registered `dedup_incremental` query.
  */
object DedupStream {

  /** The corpus-at-rest index relation: [[Dedup.rarityDocsOf]] over the
    * corpus, persisted — build once, screen every batch against it.
    * `corpus` must have `(doc_id, text)`. */
  def corpusIndex(corpus: DataFrame): DataFrame =
    Dedup.rarityDocsOf(Dedup.explodeDocs(corpus)).persist()

  /** Screen one batch of new documents against a prepared [[corpusIndex]].
    * Returns `(new_id, corpus_id, jaccard)` — every corpus document the
    * batch near-duplicates. Pure batch-side function, so the streaming
    * and batch forms share one definition. */
  def screenBatch(newDocs: DataFrame, corpusIdx: DataFrame,
                  maxDf: Option[Long] = None): DataFrame = {
    val t = Dedup.jaccardThreshold
    val corpusKept = maxDf
      .map(m => corpusIdx.withColumn("shingles",
        transform(filter(col("byRarity"), x => x.getField("df") <= lit(m)),
                  x => x.getField("sh"))))
      .getOrElse(corpusIdx)
    val corpusPostings = corpusKept
      .select(col("doc_id").as("corpus_id"), col("n_sh").as("c_n"),
              explode(col("shingles")).as("sh"))
    val batchDocs = Dedup.rarityDocsOf(Dedup.explodeDocs(newDocs))
    val incomingPrefix = Dedup.prefixPostings(batchDocs, maxDf)
    val cand = incomingPrefix.join(corpusPostings, "sh")
      .where(col("n_sh") >= col("c_n") * t && col("c_n") >= col("n_sh") * t)
      .select(col("doc_id").as("new_id"), col("corpus_id"))
      .distinct()
    cand
      .join(batchDocs.select(col("doc_id").as("new_id"),
        col("shingles").as("sa"), col("n_sh").as("na")), "new_id")
      .join(corpusIdx.select(col("doc_id").as("corpus_id"),
        col("shingles").as("sb"), col("n_sh").as("nb")), "corpus_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= t)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
  }

  /** foreachBatch driver: starts the streaming query that screens each
    * micro-batch of `newDocs` (a STREAMING `(doc_id, text)` frame)
    * against the prepared index and hands the resulting pair frame to
    * `onBatch`. */
  def start(newDocs: DataFrame, corpusIdx: DataFrame,
            maxDf: Option[Long] = None)
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    newDocs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        onBatch(screenBatch(batch, corpusIdx, maxDf), epochId)
      }
      .start()
}
