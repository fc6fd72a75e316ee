package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The bloom pre-filter is an optimization, not a semantics change: a
    * bloom filter has no false negatives and the exact semi join removes
    * its false positives, so the result must equal the plain semi join. */
  test("bloom-prefiltered semi join == plain semi join") {
    import spark.implicits._
    val viaBloom = Relational.bloomSemiJoin(spark, TestSpark.sf).collect().toSeq
    val urgent = Tables.orders(spark, TestSpark.sf)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val plain = Tables.lineitem(spark, TestSpark.sf)
      .join(urgent, $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_items"), round(sum($"l_extendedprice"), 2).as("gross"))
      .orderBy($"l_orderkey")
      .collect().toSeq
    assert(viaBloom === plain)
  }

  /** Salting is a shuffle-shape change only — every fact row matches
    * exactly one of the S replicated dimension rows. */
  test("salted join == plain join") {
    import spark.implicits._
    val salted = Relational.saltedJoin(spark, TestSpark.sf).collect().toSeq
    val plain = Tables.lineitem(spark, TestSpark.sf)
      .join(Tables.orders(spark, TestSpark.sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"), round(sum($"l_extendedprice"), 2).as("gross"))
      .orderBy($"o_orderpriority")
      .collect().toSeq
    assert(salted === plain)
  }

  test("cube emits all four grouping sets") {
    import spark.implicits._
    val cube = Relational.cubeAgg(spark, TestSpark.sf)
    val sets = cube.select(
      $"o_orderstatus".isNull.as("s"), $"o_orderpriority".isNull.as("p"))
      .distinct().collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSet
    assert(sets === Set((false, false), (false, true), (true, false), (true, true)))
    // grand total row count equals the table count
    val grand = cube.where($"o_orderstatus".isNull && $"o_orderpriority".isNull)
      .select($"n_orders").collect().head.getLong(0)
    assert(grand === Tables.orders(spark, TestSpark.sf).count())
  }

  test("pivot cross-tab row sums equal per-priority totals") {
    import spark.implicits._
    val p = Relational.pivotStatus(spark, TestSpark.sf)
      .withColumn("total", $"f_orders" + $"o_orders" + $"p_orders")
      .select($"o_orderpriority", $"total")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byPriority = Tables.orders(spark, TestSpark.sf)
      .groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p === byPriority)
  }
}
