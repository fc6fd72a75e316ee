package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IVF-PQ serving: a stream of query vectors answered from the
  * composed IVF-PQ index (coarse cells prune, 8-byte PQ codes ADC-score,
  * exact rerank on the shortlist) — the quantized counterpart of
  * [[AnnServeStream]]'s LSH serve, and the memory story that matters at
  * 10⁹ corpus vectors: the per-trigger hot set is the probed cells'
  * CODES (8 bytes/vector) plus only the shortlist's real vectors, not
  * the corpus.
  *
  * Scale design:
  *   - the index ([[PqIndex]]) is built and persisted once; at rest its
  *     assignment relation IS the partitioning of the corpus (cell =
  *     partition ⇒ probing = partition pruning) and the codes relation
  *     is the compressed store every trigger joins against;
  *   - per-batch work scales with the BATCH: probes expand the query
  *     side only (nprobe rows/query), candidates come from the
  *     cell-keyed equi-join, the ADC LUT is a per-(query, block)
  *     broadcast — the corpus never reshuffles per trigger;
  *   - answers are per-query functions of the fixed index, so results
  *     are invariant to micro-batch boundaries by construction — pinned
  *     in StreamingOpsSpec against the one-shot serve and the batch
  *     [[Similarity.ivfPqServe]] kernel (shared code path, same
  *     `excludeSelf = false` serving semantics as [[AnnServeStream]]).
  */
object PqServeStream {

  /** The persisted relations of a corpus-at-rest IVF-PQ index: prepared
    * vectors (shortlist rerank only), refined coarse centroids, cell
    * assignment, PQ codebook, PQ codes. */
  final case class PqIndex(vecs: DataFrame, cent: DataFrame,
                           assign: DataFrame, cbk: DataFrame,
                           codes: DataFrame) {
    def unpersist(): Unit = {
      vecs.unpersist(); assign.unpersist(); codes.unpersist()
    }
  }

  /** Build + persist the serving index over a raw `(vec_id, embedding)`
    * corpus. Training (Lloyd refinement of both quantizers) runs here,
    * once — serving never retrains. */
  def corpusIndex(corpus: DataFrame): PqIndex = {
    val e = SemDedupStream.prepVecs(corpus).persist()
    val (cent, assign, cbk, codes) = Similarity.ivfPqIndex(e)
    PqIndex(e, cent, assign.persist(), cbk, codes.persist())
  }

  /** Answer one batch of `(vec_id, embedding)` query vectors from the
    * prebuilt index. Returns `(query_id, neighbor_id, rnk, score)` with
    * exact cosine scores on the reranked shortlist. Serving semantics:
    * query ids are an unrelated id space, no self-exclusion. */
  def serveBatch(queries: DataFrame, idx: PqIndex, k: Int = 5): DataFrame = {
    val q = SemDedupStream.prepVecs(queries).select(
      col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    Similarity.ivfPqServe(q, idx.vecs, idx.cent, idx.assign, idx.cbk,
      idx.codes, k, excludeSelf = false)
  }

  /** foreachBatch driver answering each micro-batch of `queries` (a
    * STREAMING `(vec_id, embedding)` frame) from the prepared index. */
  def start(queries: DataFrame, idx: PqIndex, k: Int = 5,
            checkpoint: Option[String] = None)
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    var w = queries.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        onBatch(serveBatch(batch, idx, k), epochId)
      }
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    w.start()
  }
}
