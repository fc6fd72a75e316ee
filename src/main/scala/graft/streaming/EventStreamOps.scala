package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming generalizations over the `events` shape — the pieces of the
  * Structured Streaming surface the reference never uses (SURVEY §2.6:
  * no watermark → unbounded state; no custom stateful ops):
  *
  *   - [[watermarkedTenMin]]: the reference's 10-minute window agg with a
  *     30-minute watermark → append-mode emission of CLOSED windows only
  *     and bounded state (the production form of Task4's aggregation; the
  *     reference's no-watermark update mode keeps state forever);
  *   - [[runningUserCounts]]: `mapGroupsWithState` custom keyed state
  *     (running per-user event counts in update mode).
  *
  * Both take a DataFrame so batch and stream share one definition; specs
  * assert stream == batch on the same inputs.
  *
  * Scale notes: watermarks bound state store size by time, not
  * cardinality — at 100 TB/day the 10-min × type state is tiny, while
  * per-user state scales with |users| and must be partitioned by key
  * (which `groupByKey` guarantees) and aged out (TTL via timeouts) in a
  * real deployment.
  */
object EventStreamOps {

  def watermarkedTenMin(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .count()
      .select(col("window.start").as("window_start"), col("event_type"),
              col("count").as("n"))

  case class UserCount(user_id: Long, n: Long)

  /** Running per-user event counts via explicit keyed state. */
  def runningUserCounts(events: DataFrame): Dataset[UserCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          UserCount(user, n)
      }
  }

  /** Output mode for [[runningUserCounts]] (mapGroupsWithState requires
    * update mode). */
  val runningCountsMode: OutputMode = OutputMode.Update()
}
