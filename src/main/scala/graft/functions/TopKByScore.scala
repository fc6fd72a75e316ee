package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-per-group aggregate: keeps the k best `(score, id)`
  * entries under the total order score DESC, id ASC — the per-query
  * neighbor ranking every ANN truth/serve path in this library uses.
  *
  * WHY AN AGGREGATE AND NOT A WINDOW (round 20, VERDICT r19 #4): a
  * `row_number() OVER (PARTITION BY query ORDER BY ...)` <= k filter
  * must EXCHANGE the full scored stream by query and sort it — at the
  * 4M-vector rung the sampled ground-truth computation alone scores
  * ~1,600 queries x 4M corpus = 6.4e9 slim rows, a ~190 GB shuffle that
  * exceeds the probe host's disk (BASELINE.md r19). As an `Aggregator`
  * the same top-k is a partial-aggregable fold: every map task reduces
  * its slice to <= groups x k entries before anything moves, the shuffle
  * carries only those bounded buffers, and the scored stream itself is
  * never exchanged — the groupBy analog of the TakeOrdered heap the
  * `ev_ts_similarity` plan uses for its global top-k (r19 reshape).
  *
  * The buffer is a best-first-sorted Vector capped at k (k is small —
  * 5..300 in every caller); insert is an O(k) scan, merge is k inserts.
  * Ties are impossible to mis-order: (score, id) is a total order and
  * both reduce and merge apply it deterministically, so the result set
  * is bit-identical to the window form's (spec-pinned in
  * TopKByScoreSpec against a literal window computation).
  *
  * Scale: with G groups per task the in-memory state is G x k entries;
  * the ObjectHashAggregate sort-based fallback threshold (default 128
  * groups) should be raised by callers with thousands of groups — the
  * fallback would re-sort the unaggregated input per partition, exactly
  * the cost this aggregate exists to avoid (SimilarityScaleBench sets
  * spark.sql.objectHashAggregate.sortBased.fallbackThreshold=1000000).
  */
object TopKByScore {

  case class Entry(score: Double, id: Long)

  /** `true` iff a ranks strictly ahead of b (score DESC, id ASC).
    * NaN ranks as the GREATEST score — Spark's sort order for double
    * DESC — so a NaN cosine (zero-norm vector: qnorm·nnorm = 0) keeps
    * this heap bit-identical to the row_number window form it is
    * spec-pinned against (ADVICE r20: plain `>` treated NaN as
    * never-ahead, silently diverging on that edge). Total order:
    * NaN first (ties on id), then finite/infinite scores DESC. */
  private def ahead(a: Entry, b: Entry): Boolean = {
    val an = a.score.isNaN
    val bn = b.score.isNaN
    if (an || bn) (an && !bn) || (an && bn && a.id < b.id)
    else a.score > b.score || (a.score == b.score && a.id < b.id)
  }

  def aggregator(k: Int): Aggregator[Entry, Seq[Entry], Seq[Entry]] =
    new Aggregator[Entry, Seq[Entry], Seq[Entry]] {
      require(k > 0, s"top-k bound must be positive, got $k")

      override def zero: Seq[Entry] = Vector.empty

      private def insert(buf: Seq[Entry], x: Entry): Seq[Entry] = {
        if (buf.size >= k && ahead(buf.last, x)) return buf // below the floor
        val i = buf.indexWhere(e => ahead(x, e)) match {
          case -1 => buf.size
          case j  => j
        }
        val grown = (buf.take(i) :+ x) ++ buf.drop(i)
        if (grown.size > k) grown.take(k) else grown
      }

      override def reduce(buf: Seq[Entry], x: Entry): Seq[Entry] = insert(buf, x)
      override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
        b.foldLeft(a)(insert)
      override def finish(buf: Seq[Entry]): Seq[Entry] = buf
      override def bufferEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
      override def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }

  /** Untyped column form: `topK(5)(col("score"), col("neighbor_id"))`
    * yields `array<struct<score:double, id:bigint>>`, best first. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(aggregator(k), Encoders.product[Entry])
    (score, id) => fn(score, id)
  }
}
