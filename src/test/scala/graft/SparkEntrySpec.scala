package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all specs (one JVM-wide session; suites reuse it). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.codegen.fallback", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and most return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf)
      val n = df.count()
      withClue(s"query $name:") { assert(n >= 0) }
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("oracle coverage: every driver-registered query has an oracle") {
    // Declared rows-only exceptions: registered so the driver sees them,
    // but with no oracle SQL because the value is implementation-defined
    // across engines. Today that is only the HLL estimate
    // (sketch_approx_distinct: DuckDB's approx_count_distinct uses a
    // different sketch) — its value gate is SketchSpec's 5%-of-exact error
    // bound, and the exact column is hash-gated via sketch_exact_distinct.
    // Everything else registered is rebuilt exactly in DuckDB.
    val rowsOnly = Set("sketch_approx_distinct")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(noOracle.isEmpty, s"queries missing an oracle: $noOracle")
    assert((rowsOnly -- SparkEntry.queries.keySet).isEmpty,
      "rows-only exception list names an unregistered query")
  }
}
