package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway measurement probes for the optimization round (r21):
  * A/B a single SQL conf over a set of registered queries (noop sink,
  * warm run then 2 timed, min reported). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val confKey = if (args.length > 1) args(1) else null
    val confVal = if (args.length > 2) args(2) else null
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    })

    def run(name: String): (Double, Double) = {
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        Thread.sleep(200); cpuNs.set(0L)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Thread.sleep(200)
        (t, cpuNs.get / 1e9)
      }
      val best = ts.drop(1).minBy(_._1) // skip cold sample
      (best._1, ts.drop(1).map(_._2).min)
    }
    for (name <- names) {
      if (confKey != null) spark.conf.unset(confKey)
      val (bw, bc) = run(name)
      if (confKey != null) spark.conf.set(confKey, confVal)
      val (aw, ac) = if (confKey != null) run(name) else (-1.0, -1.0)
      println(f"AB $name base=$bw%.3f cpu=$bc%.2f alt=$aw%.3f altcpu=$ac%.2f")
    }
    spark.stop()
  }
}
