package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (test scope, not shipped): times named
  * SparkEntry queries (all if no args), two runs each. Run:
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.ScratchProfile dedup_ngram_jaccard ..."
  */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.names.foreach { t =>
      try Tables.load(spark, sf, t).count() catch { case _: Throwable => () }
    }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val n = fn(spark, sf).count()
        println(f"$name%-28s run$run ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      }
    }
    spark.stop()
  }
}
