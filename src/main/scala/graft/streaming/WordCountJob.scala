package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's legacy DStream socket word count (`Client.py:15-28`)
  * rebuilt on Structured Streaming: socket source → explode/split →
  * per-batch grouped counts.
  *
  * DStream `reduceByKey` is batch-local (no cross-batch state), so the
  * counts are computed inside `foreachBatch` on each micro-batch alone —
  * `outputMode("complete")` would instead give cumulative counts
  * (SURVEY §1.1). 1-second processing-time trigger matches
  * `StreamingContext(sc, 1)`.
  */
object WordCountJob {

  def run(spark: SparkSession, host: String, port: Int,
          onBatch: (Seq[(String, Long)], Long) => Unit = printBatch): StreamingQuery = {
    val lines = spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load()
    lines.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val counts = TaxiPipelines.wordCount(batch)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        if (counts.nonEmpty) onBatch(counts, id)
      }
      .start()
  }

  private def printBatch(counts: Seq[(String, Long)], id: Long): Unit = {
    println(s"-------------------------------------------\nBatch: $id")
    counts.sortBy(_._1).foreach { case (w, n) => println(s"($w, $n)") }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark,
      args.lift(0).getOrElse("localhost"),
      args.lift(1).map(_.toInt).getOrElse(10002)).awaitTermination()
  }
}
