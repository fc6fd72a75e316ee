package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: time one registered query N times and dump its plan.
  * Usage: runMain graft.tools.TimeQ <name> [sfDir] [reps] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (args.length > 3 && args(3) == "explain") fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"RUN $r: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      spark.catalog.clearCache() // honest reps: don't reuse persisted relations
    }
    spark.stop()
  }
}
