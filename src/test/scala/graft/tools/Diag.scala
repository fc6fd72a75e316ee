package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (r13): localize where sim_ann_lsh time goes at sf1.
  * Test-scope tool: run with `sbt "Test/runMain graft.tools.Diag <dir>"`. */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = Similarity.vecs(spark, dir)
    val n = e.count()
    val (pt, pb) = Similarity.lshParams(n)
    println(s"DIAG n=$n rung=($pt,$pb)")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // signature cost scaling with dot count (no persist, noop sink)
    for ((t, b) <- Seq((1, 6), (4, 6), (6, 8), (6, 8))) {
      time(s"lshBuckets($t,$b) noop")(
        Similarity.lshBuckets(e, tables = t, bits = b)
          .write.mode("overwrite").format("noop").save())
    }
    val buckets = Similarity.lshBuckets(e, tables = pt, bits = pb).persist()
    time("buckets materialize")(buckets.count())
    val occ = buckets.groupBy($"tbl", $"bucket").count()
    occ.agg(max($"count"), avg($"count"), count(lit(1))).show()
    // top buckets
    occ.orderBy($"count".desc).show(5)
    val cand = Similarity.lshCandidates(e, buckets,
      Similarity.capPostings(buckets, Similarity.lshPostingsCap(n, pb)))
    val nc = time("candidates count")(cand.count())
    println(s"DIAG candidates=$nc")
    time("rankTopK")(Similarity.rankTopK(cand, e, Similarity.queriesOf(e))
      .write.mode("overwrite").format("noop").save())
    time("full topkLsh again")(Similarity.topkLsh(spark, dir).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
