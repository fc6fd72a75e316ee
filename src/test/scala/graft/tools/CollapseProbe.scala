package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (test scope): isolate the cost of the corpus-side twin
  * collapse inside the multiprobe plan at a given corpus. Times, on the
  * same session: (a) the collapse window alone, (b) the corpus postings
  * build with and without the collapse join, (c) the candidate distinct
  * with and without. Run:
  * sbt "Test/runMain graft.tools.CollapseProbe /tmp/sim_scale/emb_x100"
  */
object CollapseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sim_scale/emb_x100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(label: String)(body: => Long): Unit = {
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        val n = body
        println(f"$label%-34s run$r ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      }
    }

    val e = Similarity.vecs(spark, dir)
    val n = e.count()
    val (pt, pb) = Similarity.lshParams(n)
    println(s"corpus $n vectors, rung ${pt}x$pb")

    t("collapse window alone") {
      Similarity.collapseTwins(e).count()
    }
    val buckets = Similarity.lshBuckets(e, tables = pt, bits = pb).persist()
    t("buckets (persisted build)") { buckets.count() }
    t("postings capped, NO collapse") {
      Similarity.capPostings(buckets, Similarity.lshPostingsCap(n, pb)).count()
    }
    t("postings capped, WITH collapse") {
      Similarity.capPostings(
        buckets.join(Similarity.collapseTwins(e).select($"vec_id"), "vec_id"),
        Similarity.lshPostingsCap(n, pb)).count()
    }
    val qb = buckets.join(
        e.filter($"vec_id" % 50 === 0)
          .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm")),
        $"vec_id" === $"query_id")
      .select($"query_id", $"qv", $"qnorm", $"tbl", $"bucket")
    def cand(corpus: org.apache.spark.sql.DataFrame): Long =
      Similarity.multiprobeCandidates(qb, corpus, bits = pb).count()
    t("mp candidates, NO collapse") {
      cand(Similarity.capPostings(buckets, Similarity.lshPostingsCap(n, pb)))
    }
    t("mp candidates, WITH collapse") {
      cand(Similarity.capPostings(
        buckets.join(Similarity.collapseTwins(e).select($"vec_id"), "vec_id"),
        Similarity.lshPostingsCap(n, pb)))
    }
    spark.stop()
  }
}
