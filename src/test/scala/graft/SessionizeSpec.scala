package graft

import java.sql.Timestamp
import graft.operators.EventOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the session-window boundary semantics the DuckDB oracle must
  * mirror: Spark's `session_window` with a 30-minute gap MERGES events
  * whose gap equals exactly the timeout (touching sessions coalesce; a
  * new session opens only when gap > timeout), so the oracle's lag-based
  * rebuild must split on `gap > timeout`, not `>=`. Verified empirically
  * on Spark 4.1.2 by the fixture below. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exact 30-minute gap stays in the session; gap > 30 min splits") {
    import spark.implicits._
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 1.0),
      // gap == exactly 30 min → touching sessions MERGE (same session)
      (2L, Timestamp.valueOf("2024-01-01 00:30:00"), 7L, "click", 1.0),
      // gap 50 min > 30 min → NEW session
      (3L, Timestamp.valueOf("2024-01-01 01:20:00"), 7L, "click", 1.0),
      // other user, single event
      (4L, Timestamp.valueOf("2024-01-01 00:10:00"), 8L, "view", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")

    val sessions = df
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("start"), $"session_window.end".as("end"),
              $"user_id", $"n")
      .collect()
      .map(r => (r.getLong(2), r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getLong(3)))
      .toSet

    assert(sessions == Set(
      (7L, "2024-01-01 00:00:00.0", "2024-01-01 01:00:00.0", 2L),
      (7L, "2024-01-01 01:20:00.0", "2024-01-01 01:50:00.0", 1L),
      (8L, "2024-01-01 00:10:00.0", "2024-01-01 00:40:00.0", 1L)))
  }

  test("oracle's lag-based rebuild (split on gap > timeout) == session_window on real events") {
    import spark.implicits._
    // The DuckDB oracle's algorithm, re-expressed in Spark over the same
    // table: split where gap > 30 min, session_end = max(ts) + 30 min.
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val groups = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rebuilt = Tables.events(spark, TestSpark.sf)
      .withColumn("prev_us", lag(Tables.micros($"ts"), 1).over(byUser))
      .withColumn("new_s",
        when($"prev_us".isNull ||
             Tables.micros($"ts") - $"prev_us" > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("sid", sum($"new_s").over(groups))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts").as("session_start"),
           (max($"ts") + expr("INTERVAL 30 minutes")).as("session_end"),
           count(lit(1)).as("n_events"),
           round(sum($"value"), 2).as("session_value"))
      .select($"session_start", $"session_end", $"user_id", $"n_events", $"session_value")

    val key = (r: org.apache.spark.sql.Row) =>
      (r.get(0), r.get(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val got = EventOps.sessionize(spark, TestSpark.sf).collect().map(key).toSet
    val exp = rebuilt.collect().map(key).toSet
    assert((got -- exp).isEmpty && (exp -- got).isEmpty,
      s"diff: extra=${(got -- exp).take(3)} missing=${(exp -- got).take(3)}")
  }
}
