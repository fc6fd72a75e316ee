package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-term diagnosis for `dedup_cand_pairs` growth (VERDICT r16 #2:
  * 33.5 s at sf10 = 7.0×/decade, the one family number above the
  * ~3×/decade target). Per K-replica corpus (the MakeScale documents
  * construction — replicas share no shingles, so every per-shingle term
  * is linear in K BY CONSTRUCTION and superlinear wall growth must come
  * from the execution shape, not the algorithm):
  *
  *   - `postings`: prefix posting rows (Σ per-doc prefix lengths);
  *   - `pre_distinct`: Σ C(m,2) over per-shingle posting counts m — the
  *     candidate JOIN's output volume before distinct;
  *   - `max_m`/`p99_m`: posting-list skew (a hot shingle pays m² in one
  *     task);
  *   - `cand`: distinct candidate pairs; `pairs`: verified output;
  *   - `build_sec`: the registered `dedup_cand_pairs` build wall.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *      SPARK_GRAFT_DEDUP_PROBE_K=10,100 sbt "runMain
  *      graft.tools.DedupPairsProbe". One JSON line per K.
  */
object DedupPairsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text")

    sys.env.get("SPARK_GRAFT_DEDUP_PROBE_K")
      .map(_.split(",").filter(_.nonEmpty).map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 10, 100)).foreach { k =>
      val dir = s"/tmp/dedup_scale/x$k"
      // the MakeScale documents transform: every 3rd token suffixed ~r,
      // so every 3-shingle is replica-unique (same construction as the
      // sf1/sf10 probes; r == 0 is the identity)
      (0 until k).map { r =>
        val text =
          if (r == 0) $"text"
          else array_join(
            transform(split($"text", " ", -1),
              (t, i) => when(i % 3 === 0, concat(t, lit(s"~$r"))).otherwise(t)),
            " ")
        base.select(($"doc_id" + lit(r.toLong * 100000000L)).as("doc_id"),
          text.as("text"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val docs = Dedup.rarityDocs(spark, dir)
      val nDocs = docs.count()
      val post = Dedup.prefixPostings(docs, None)
      val m = post.groupBy($"sh").agg(count(lit(1)).as("m")).persist()
      val row = m.agg(
        sum($"m").as("postings"),
        sum(($"m" * ($"m" - 1) / 2).cast("long")).as("pre_distinct"),
        max($"m").as("max_m"),
        expr("approx_percentile(m, 0.99)").as("p99_m")).head()
      val (postings, preDistinct, maxM, p99M) =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      m.unpersist()
      val cand = Dedup.candidatePairs(docs, None).count()
      spark.catalog.clearCache()

      val t0 = System.nanoTime()
      val pairs = Dedup.candPairsBuild(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(s"""{"probe":"dedup_cand_pairs","k":$k,"docs":$nDocs,"postings":$postings,"pre_distinct":$preDistinct,"max_m":$maxM,"p99_m":$p99M,"cand":$cand,"pairs":$pairs,"build_sec":${r3(sec)}}""")
    }
    spark.stop()
  }
}
