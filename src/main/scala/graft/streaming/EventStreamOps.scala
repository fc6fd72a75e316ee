package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming generalizations over the `events` shape — the pieces of the
  * Structured Streaming surface the reference never uses (SURVEY §2.6:
  * no watermark → unbounded state; no custom stateful ops; no
  * stream-stream joins):
  *
  *   - [[watermarkedTenMin]]: the reference's 10-minute window agg with a
  *     30-minute watermark → append-mode emission of CLOSED windows only
  *     and bounded state (the production form of Task4's aggregation; the
  *     reference's no-watermark update mode keeps state forever);
  *   - [[runningUserCounts]]: `mapGroupsWithState` custom keyed state
  *     (running per-user event counts in update mode);
  *   - [[dedupWithinWatermark]]: streaming exact dedup with time-bounded
  *     state;
  *   - [[sessionizeStream]]: `flatMapGroupsWithState` sessionization with
  *     event-time timeout — the custom-state twin of the batch
  *     `session_window` operator (same merge-on-touch gap semantics);
  *   - [[attributionJoin]]: watermarked stream-stream interval join
  *     (purchase ← clicks within the preceding 30 minutes).
  *
  * All take DataFrames so batch and stream share one definition; specs
  * assert stream == batch on the same inputs.
  *
  * Scale notes: watermarks bound state store size by time, not
  * cardinality — at 100 TB/day the 10-min × type state is tiny, while
  * per-user/per-key state scales with cardinality and must be partitioned
  * by key (which `groupByKey`/stream-stream joins guarantee) and aged out
  * (event-time timeouts / join time bounds — both present here). The
  * interval join's state per side is bounded by watermark delay + join
  * range; an unbounded-range stream join would buffer forever.
  */
object EventStreamOps {

  /** Stateless streaming anomaly scoring against batch-computed robust
    * thresholds — the standard "train batch, apply stream" split: the
    * per-type (median, MAD) table comes from
    * [[graft.operators.EventOps.madThresholds]] over the corpus at rest,
    * is broadcast (it has |event_types| rows), and every micro-batch
    * scores + filters in a map-only stage — no streaming state at all, so
    * this composes with any downstream sink/mode and survives restarts
    * trivially. Same round-6 score and 3.5 cut as the batch
    * `ev_anomaly_mad`, so stream flags == batch flags on the same rows
    * (StreamingOpsSpec). */
  def scoreAnomalies(events: DataFrame, thresholds: DataFrame): DataFrame =
    events
      .join(broadcast(thresholds), "event_type")
      .withColumn("robust_z",
        round(lit(0.6745) * (col("value") - col("med")) / col("mad"), 6))
      .where(abs(col("robust_z")) > 3.5)
      .select(col("event_type"), col("event_id"), col("value"), col("robust_z"))

  def watermarkedTenMin(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .count()
      .select(col("window.start").as("window_start"), col("event_type"),
              col("count").as("n"))

  /** Sliding-window variant (10-minute windows every 5): the streaming
    * form of [[graft.operators.EventOps.slidingWindows]]. State holds
    * duration/slide = 2 open windows per (grid slot × type) until the
    * watermark closes them — sliding multiplies state by that ratio, not
    * by input volume. */
  def watermarkedSliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
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

  /** Streaming exact dedup on event_id. `dropDuplicatesWithinWatermark`
    * (not plain `dropDuplicates`): state for a key is dropped once the
    * watermark passes its event time, so memory is bounded by the
    * watermark delay instead of growing with total distinct keys —
    * the only viable form at unbounded stream length. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  private val GapUs = 30L * 60 * 1000000 // 30-minute session gap, microseconds

  case class OpenSession(startUs: Long, lastUs: Long, n: Long, value: Double)
  case class SessionBuf(sessions: List[OpenSession]) // sorted by startUs, non-touching
  case class SessionOut(session_start: Timestamp, session_end: Timestamp,
                        user_id: Long, n_events: Long, session_value: Double)

  /** Epoch microseconds → Timestamp without precision loss (the ms
    * constructor alone would truncate the microsecond part). */
  private def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000)
    t.setNanos((math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  private def close(user: Long, s: OpenSession): SessionOut =
    SessionOut(tsOfMicros(s.startUs), tsOfMicros(s.lastUs + GapUs), user, s.n, s.value)

  /** Insert one event into a sorted open-session list, merging every
    * session it touches (an out-of-order event can bridge two sessions
    * into one — the case a single-slot state gets wrong). Merge-on-touch:
    * gap ≤ timeout extends, matching `session_window` (SessionizeSpec). */
  private def addEvent(sessions: List[OpenSession], tsUs: Long, v: Double): List[OpenSession] = {
    val (before, rest) = sessions.span(_.lastUs + GapUs < tsUs)
    val (touching, after) = rest.span(_.startUs - GapUs <= tsUs)
    val merged =
      if (touching.isEmpty) OpenSession(tsUs, tsUs, 1, v)
      else OpenSession(
        math.min(touching.head.startUs, tsUs),
        math.max(touching.last.lastUs, tsUs),
        touching.map(_.n).sum + 1,
        touching.map(_.value).sum + v)
    before ::: merged :: after
  }

  /** Sessionization as explicit keyed state: per user, a sorted list of
    * open sessions; events merge on touch, and a session is emitted (one
    * append-mode row) only once the event-time watermark passes its end —
    * never earlier, so any late-but-within-watermark event can still
    * extend or bridge it. This is what `session_window` does internally,
    * surfaced through `flatMapGroupsWithState` so arbitrary per-session
    * aggregates/payloads can ride along. State per key is O(open
    * sessions within the watermark horizon), bounded by the event-time
    * timeout. */
  def sessionizeStream(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      // keep the watermarked `ts` attribute itself in the projection —
      // event-time timeout requires it to reach the stateful operator
      .select(col("user_id").cast("long"), col("ts"),
              unix_micros(col("ts")).as("ts_us"), col("value").cast("double"))
      .as[(Long, Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuf, SessionOut](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, Long, Double)],
         state: GroupState[SessionBuf]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000
          var sessions = state.getOption.map(_.sessions).getOrElse(Nil)
          if (!state.hasTimedOut) {
            // iterator order within a micro-batch is arbitrary; insertion
            // handles any order, sorting just keeps merges single-pass.
            // Rows older than the watermark are dropped (tsUs >= wmUs):
            // flatMapGroupsWithState delivers them to the state function,
            // but a built-in stateful operator would discard them — without
            // this, a too-late event could open a second session overlapping
            // one already emitted in append mode.
            rows.toArray.sortBy(_._3).foreach { case (_, _, tsUs, v) =>
              if (tsUs >= wmUs) sessions = addEvent(sessions, tsUs, v)
            }
          }
          val (closed, open) = sessions.partition(_.lastUs + GapUs <= wmUs)
          if (open.nonEmpty) {
            state.update(SessionBuf(open))
            // fire when the watermark passes the earliest open session end
            state.setTimeoutTimestamp(open.map(_.lastUs).min / 1000 + GapUs / 1000 + 1)
          } else {
            state.remove()
          }
          closed.map(close(user, _)).iterator
      }
  }

  /** Stream-static join: every micro-batch of events enriched against a
    * STATIC dimension (re-read per batch, broadcast when small). No state
    * store at all — the third join flavor next to batch-batch and
    * stream-stream, and the streaming analogue of the relational layer's
    * broadcast dimension joins. At 100 TB/day of stream the static side's
    * size is the only constraint (broadcast under ~GB; else shuffle each
    * batch). */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Watermarked stream-stream interval join: each purchase matched with
    * every click by the same user in the preceding 30 minutes. The time
    * bound + watermarks let Spark expire both join buffers; state is
    * O(30 min of input), not O(stream). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_id"))
    p.join(c, expr(
      """p_user = c_user AND
        |click_ts >= purchase_ts - INTERVAL 30 MINUTES AND
        |click_ts <= purchase_ts""".stripMargin))
      .select(col("purchase_id"), col("p_user").as("user_id"),
              col("purchase_ts"), col("click_id"), col("click_ts"))
  }
}
