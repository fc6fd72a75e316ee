package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scaling curve for the prefix-filtered near-dup join
  * (BASELINE.md "dedup scaling" section).
  *
  * Corpus construction: the sf0.1 `documents` table replicated K× with
  * every token of replica k suffixed `~k`. Each replica is therefore
  * ISOMORPHIC to the original (identical shingle-set structure, identical
  * Jaccard values — suffixing is a bijection on the token vocabulary) and
  * replicas share NO shingles, so the K× corpus is K independent copies
  * of the same near-dup problem in one table: output pairs must be
  * exactly K × the originals, and a correctly-scaling candidate
  * generator should grow ~linearly in K — while an un-filtered inverted
  * index would grow with the square of each posting list.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.DedupScaleBench". Prints one JSON line per K.
  */
object DedupScaleBench {
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

    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val nBase = base.count()

    Seq(1, 2, 5, 10).foreach { k =>
      val dir = s"/tmp/dedup_scale/x$k"
      val corpus = (0 until k).map { r =>
        base.select(
          ($"doc_id" + lit(r.toLong * 10000000L)).as("doc_id"),
          array_join(transform(split($"text", " "),
            t => concat(t, lit(s"~$r"))), " ").as("text"))
      }.reduce(_ unionByName _)
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val t0 = System.nanoTime()
      val pairs = Dedup.ngramJaccard(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop the persisted rarity relation
      println(f"""{"k":$k,"docs":${nBase * k},"pairs":$pairs,"sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
