package graft

import graft.sources.SynthScan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SynthSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val fmt = "graft.sources.SynthProvider"

  private def synth(rows: Long = 1000L): DataFrame =
    spark.read.format(fmt).option("rows", rows).option("partitions", 8).load()

  private def scanOf(df: DataFrame): SynthScan = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    scans.head.asInstanceOf[SynthScan]
  }

  test("batch read is deterministic and complete") {
    val df = synth(1000)
    assert(df.count() === 1000L)
    val again = synth(1000).orderBy("doc_id").collect()
    assert(synth(1000).orderBy("doc_id").collect() === again)
    assert(df.rdd.getNumPartitions === 8)
  }

  test("doc_id range filters reach partition planning") {
    val df = synth(1000).where(col("doc_id") >= 100 && col("doc_id") < 250)
    assert(scanOf(df).plannedRange === (100L, 250L))
    assert(df.count() === 150L)
    // an equality pin collapses the range to one row
    val one = synth(1000).where(col("doc_id") === 42)
    assert(scanOf(one).plannedRange === (42L, 43L))
    assert(one.count() === 1L)
  }

  test("non-pushable predicates stay post-scan and still apply") {
    val df = synth(200).where(col("lang") === "en" && col("doc_id") < 100)
    assert(scanOf(df).plannedRange === (0L, 100L)) // range pushed
    val rows = df.select("doc_id").collect().map(_.getLong(0))
    assert(rows.nonEmpty && rows.forall(id => id % 4 == 0)) // langOf: id % 4 == 0 → "en"
  }

  test("column pruning reaches the reader (SELECT doc_id reads 1 column)") {
    val df = synth(100).select("doc_id")
    assert(scanOf(df).readSchema().fieldNames.toSeq === Seq("doc_id"))
    assert(df.collect().map(_.getLong(0)).sorted === (0L until 100L).toArray)
  }

  test("collector sink: two-phase commit aggregates all tasks, partitioning-invariant") {
    import graft.sources.CollectorSink
    val ev = Tables.events(spark, TestSpark.sf).select(col("event_id"), col("user_id"))
    ev.repartition(8).write.format("graft.sources.CollectorSinkProvider")
      .option("name", "t8").mode("append").save()
    ev.coalesce(1).write.format("graft.sources.CollectorSinkProvider")
      .option("name", "t1").mode("append").save()
    val n = ev.count()
    val (rows8, sum8) = CollectorSink.results("t8")
    val (rows1, sum1) = CollectorSink.results("t1")
    assert(rows8 === n && rows1 === n)
    // xor-folded checksum must not depend on task layout or row order
    assert(sum8 === sum1)
  }

  test("synth stream → collector streaming sink: per-epoch commits total the table") {
    import graft.sources.CollectorSink
    CollectorSink.results.remove("stream1")
    val q = spark.readStream.format(fmt)
      .option("rows", 250).option("partitions", 4).option("rowsPerBatch", 100)
      .load()
      .select(col("doc_id"))
      .writeStream.format("graft.sources.CollectorSinkProvider")
      .option("name", "stream1")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("collector_cp").toString)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val (rows, sum) = CollectorSink.results("stream1")
    assert(rows === 250L)
    // checksum equals a batch write of the same projection
    val batchDf = synth(250).select(col("doc_id"))
    batchDf.write.format("graft.sources.CollectorSinkProvider")
      .option("name", "batch1").mode("append").save()
    assert(sum === CollectorSink.results("batch1")._2)
  }

  test("micro-batch stream drains to the full table in rowsPerBatch steps") {
    import spark.implicits._
    val q = spark.readStream.format(fmt)
      .option("rows", 350).option("partitions", 4).option("rowsPerBatch", 100)
      .load()
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("synth_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val total = spark.sql("SELECT sum(n) FROM synth_counts").collect().head.getLong(0)
      assert(total === 350L)
      // 350 rows at 100/batch → at least 4 micro-batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    } finally q.stop()
  }
}
