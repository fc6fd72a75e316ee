package graft

import org.apache.spark.sql.functions.when
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution behavior the 100 TB story leans on: the
  * salted join ([[graft.operators.Relational.saltedJoin]]) and the skew
  * audit (`rel_skew_audit`) are the MANUAL tools; this spec proves the
  * engine's RUNTIME counterpart actually engages on this build — AQE
  * detecting a skewed shuffle partition at a join and splitting it —
  * so the library's guidance ("a hot key at 100× average: salt it, or
  * let AQE split it") rests on verified behavior, not documentation. */
class AqeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val s = spark
    import s.implicits._
    val conf = Map(
      // thresholds scaled down so a ~3 MB hot partition counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      // force the shuffle join path (the skew machinery under test)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one pathologically hot key (95% of the left side) + a uniform tail
      val left = spark.range(0, 200000)
        .select(when($"id" < 190000, 0L).otherwise($"id" % 64).as("k"),
          $"id".as("v"))
      val right = spark.range(0, 64).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS frame (not a derived count) so its own adaptive
      // plan finalizes and carries the runtime skew decision
      val n = joined.collect().length
      assert(n == 200000, s"join lost rows: $n")
      // Primary check: the isSkewJoin flag on the finalized adaptive
      // plan's join node — a real API, stable across Spark upgrades.
      // The "skew=true" toString fragment (an implementation detail of
      // SortMergeJoinExec.nodeName, ADVICE r10) is kept only as a
      // fallback for plan shapes where the join node types differ.
      val exec = joined.queryExecution.executedPlan
      val finalPlan = exec match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val skewJoins = finalPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec if j.isSkewJoin => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec if j.isSkewJoin => j
      }
      val plan = exec.toString
      assert(skewJoins.nonEmpty || plan.contains("skew=true"),
        s"AQE did not mark the skewed join (no isSkewJoin node, no 'skew=true'):\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
