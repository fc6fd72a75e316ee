package graft.streaming

import graft.operators.Similarity
import graft.functions.VectorDot.vectorDot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SemDeDup: every micro-batch of newly ingested embedding
  * vectors is screened against an IVF-cell-indexed corpus at rest,
  * emitting `(new_id, corpus_id, score)` for every corpus vector the
  * batch semantically duplicates (cosine ≥ [[Similarity.SemThreshold]]
  * within the shared cell) — the embedding-space twin of [[DedupStream]]
  * (cells play the role of shingle postings), and the streaming form of
  * the registered `sim_semdedup` batch kernel.
  *
  * Production semantics: the corpus at rest WINS — a new arrival that
  * near-duplicates a corpus vector is the one to drop, so pairs are
  * oriented (new, corpus) rather than (keep, drop) by id.
  *
  * Scale design, mirroring [[DedupStream]]:
  *   - the corpus index ([[corpusIndex]]) is built once and persisted:
  *     one corpus scan against the broadcast centroids, exactly the
  *     partitioning a vector corpus at rest would be bucketed by;
  *   - per-batch work scales with the BATCH: new vectors are assigned
  *     to cells by a broadcast-centroid map (no corpus shuffle), and the
  *     exact-cosine verify runs only on same-cell candidates via a cell
  *     equi-join;
  *   - cell assignment is PER-VECTOR (a function of the vector and the
  *     fixed centroids), so the emitted pair set is invariant to
  *     micro-batch boundaries by construction — pinned in
  *     StreamingOpsSpec (micro-batched == one-shot);
  *   - cross-cell near-dups are traded away exactly as in the batch
  *     SemDeDup approximation ([[Similarity.semDedup]] scaladoc).
  */
object SemDedupStream {

  /** `(vec_id, embedding)` → the `(vec_id, v, norm)` relation the cell
    * machinery consumes (doubles + precomputed norm). */
  private[graft] def prepVecs(raw: DataFrame): DataFrame =
    raw.withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("norm", sqrt(vectorDot(col("v"), col("v"))))
      .select(col("vec_id"), col("v"), col("norm"))

  /** The corpus-at-rest index: per-vector max-cosine cell assignment
    * `(vec_id, cid, v, norm)`, persisted. Centroids are the corpus
    * vectors with `vec_id <` [[Similarity]]'s NCENT, recoverable from
    * the index itself (see [[centroidsFrom]]). */
  def corpusIndex(corpus: DataFrame): DataFrame = {
    val e = prepVecs(corpus)
    Similarity.cellAssignment(e, Similarity.centroidsOf(e)).persist()
  }

  /** The broadcast centroid relation of a [[corpusIndex]] — re-derived
    * from the index so batch assignment uses the SAME centroids the
    * corpus was indexed with. */
  def centroidsFrom(corpusIdx: DataFrame): DataFrame =
    Similarity.centroidsOf(corpusIdx.select(col("vec_id"), col("v"), col("norm")))

  /** Screen one batch of new `(vec_id, embedding)` vectors against a
    * prepared [[corpusIndex]]. Returns `(new_id, corpus_id, score)`.
    * Pure batch-side function, shared by the streaming and batch forms. */
  def screenBatch(newVecs: DataFrame, corpusIdx: DataFrame): DataFrame = {
    val assignNew = Similarity.cellAssignment(prepVecs(newVecs), centroidsFrom(corpusIdx))
    assignNew.as("a").join(corpusIdx.as("b"), col("a.cid") === col("b.cid"))
      .withColumn("score",
        round(vectorDot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 6))
      .where(col("score") >= Similarity.SemThreshold)
      .select(col("a.vec_id").as("new_id"), col("b.vec_id").as("corpus_id"), col("score"))
  }

  /** foreachBatch driver: starts the streaming query screening each
    * micro-batch of `newVecs` (a STREAMING `(vec_id, embedding)` frame)
    * against the prepared index. */
  def start(newVecs: DataFrame, corpusIdx: DataFrame)
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    newVecs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        onBatch(screenBatch(batch, corpusIdx), epochId)
      }
      .start()
}
