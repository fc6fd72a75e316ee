package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The driver's testdata generator has shipped `events.ts` in three
  * parquet flavors across rounds: TIMESTAMP(NANOS) (read as LongType
  * under the legacy flag), TIMESTAMP(MICROS, adjustedToUTC=true) (LTZ)
  * and naive TIMESTAMP(MICROS) (NTZ). The round-11→12 flip from LTZ to
  * NTZ crashed every query that used `unix_micros` or the native as-of
  * plan — and the crashes were silently dropped from both the
  * correctness report and the bench. This spec pins the fix at its
  * semantic root: the four affected queries must return IDENTICAL
  * flavor-independent values on an LTZ and an NTZ copy of the same
  * events data, so the next flavor flip is a no-op instead of a
  * four-query outage. */
class TimestampFlavorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The sf0.001 events staged once per flavor: `ts` cast to LTZ
    * (`timestamp`) or NTZ (`timestamp_ntz`), written under
    * `<dir>/events.parquet` so `Tables.events` loads it like a testdata
    * dir. Under the UTC session both casts are instant-preserving, so
    * the two dirs hold the same instants in different physical types. */
  private def stage(flavor: String): String = {
    val dir = Files.createTempDirectory(s"tsflavor_$flavor").toString
    Tables.events(spark, TestSpark.sf)
      .withColumn("ts", col("ts").cast(flavor))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
  private lazy val ltzDir = stage("timestamp")
  private lazy val ntzDir = stage("timestamp_ntz")

  /** Collects only flavor-independent columns (longs/strings/doubles —
    * everything except raw timestamp columns, whose JVM type rightly
    * tracks the flavor) as a comparable multiset. */
  private def values(df: DataFrame): Seq[Seq[Any]] = {
    val keep = df.schema.fields.filter(f =>
      !f.dataType.typeName.startsWith("timestamp")).map(_.name).toSeq
    df.select(keep.map(col): _*).collect().toSeq.map(_.toSeq)
  }

  private val affected: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
    Seq(
      "ev_asof_join"      -> (operators.EventOps.asofJoin _),
      "ev_asof_native"    -> (operators.EventOps.asofNative _),
      "ev_lateness_audit" -> (operators.EventOps.latenessAudit _),
      "ev_transitions"    -> (operators.EventOps.transitions _),
      "ev_sessionize"     -> (operators.EventOps.sessionize _),
    )

  test("queries read both LTZ and NTZ events without error") {
    for ((name, fn) <- affected; dir <- Seq(ltzDir, ntzDir))
      withClue(s"$name on $dir:") { assert(fn(spark, dir).count() > 0) }
  }

  test("flavor-independent results are identical across LTZ and NTZ") {
    for ((name, fn) <- affected) {
      val l = values(fn(spark, ltzDir))
      val n = values(fn(spark, ntzDir))
      withClue(s"$name:") { assert(l == n) }
    }
  }

  test("micros helper agrees with unix_micros on LTZ and is cast-stable on NTZ") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")
    val df = Seq(t).toDF("ts")
    val viaHelper = df.select(Tables.micros($"ts")).as[Long].head()
    val viaBuiltin = df.select(unix_micros($"ts")).as[Long].head()
    assert(viaHelper === viaBuiltin)
    val ntz = df.select($"ts".cast("timestamp_ntz").as("ts"))
    assert(ntz.select(Tables.micros($"ts")).as[Long].head() === viaBuiltin)
  }
}
