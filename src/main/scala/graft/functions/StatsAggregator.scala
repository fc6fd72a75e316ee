package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass numeric summary (count / sum / min / max) as a typed
  * `Aggregator` — the user-facing custom-aggregation API (SURVEY §7.3).
  *
  * The buffer is a flat case class with product encoders, so the
  * aggregation stays in Tungsten rows (no kryo blobs) and merges
  * associatively — the same contract a sketch (HLL, KLL, reservoir) would
  * implement with a binary buffer.
  */
object StatsAggregator {

  case class Stats(count: Long, sum: Double, min: Double, max: Double)

  val empty: Stats = Stats(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

  val of: Aggregator[Double, Stats, Stats] = new Aggregator[Double, Stats, Stats] {
    override def zero: Stats = empty
    override def reduce(b: Stats, x: Double): Stats =
      Stats(b.count + 1, b.sum + x, math.min(b.min, x), math.max(b.max, x))
    override def merge(a: Stats, b: Stats): Stats =
      Stats(a.count + b.count, a.sum + b.sum,
            math.min(a.min, b.min), math.max(a.max, b.max))
    override def finish(r: Stats): Stats = r
    override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
