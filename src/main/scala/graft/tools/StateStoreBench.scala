package graft.tools

import graft.streaming.{EventStreamOps, StateStores}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Measured HDFS-backed vs RocksDB state-store comparison (VERDICT r16
  * #5: `StateStores` wires the provider and RecoverySpec pins recovery on
  * it, but no throughput/state-size row existed).
  *
  * Workload: [[EventStreamOps.runningUserCounts]] — mapGroupsWithState
  * keyed on user_id with NO timeout, so state rows = distinct users ever
  * seen: the unbounded-keyed-state shape where the HDFS provider's
  * heap-resident map is the 100 TB risk. Batches arrive as parquet file
  * drops (`maxFilesPerTrigger = 1`), every batch touching EVERY user
  * (worst case for changelog size), user cardinality swept via
  * SPARK_GRAFT_SS_USERS (default 200k/1M/2M).
  *
  * Per (provider, users) cell, one JSON line with:
  *   - `rows_per_sec`: events processed / wall across all batches;
  *   - `state_rows`: numRowsTotal from the final progress;
  *   - `state_mem_bytes`: provider-reported memoryUsedBytes (heap map for
  *     HDFS, block cache + memtables for RocksDB);
  *   - `ckpt_bytes_per_batch`: on-disk state checkpoint bytes / batches
  *     (RocksDB runs with changelog checkpointing, the shipped conf).
  *
  * Run: SPARK_GRAFT_SS_USERS=200000,1000000 sbt "runMain
  * graft.tools.StateStoreBench". Timing-sensitive: run alone.
  */
object StateStoreBench {
  private val Batches = 4

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def dirSize(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(dirSize).sum

    val userCounts = sys.env.get("SPARK_GRAFT_SS_USERS")
      .map(_.split(",").filter(_.nonEmpty).map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 1000000L, 2000000L))

    for (users <- userCounts; rocks <- Seq(false, true)) {
      val root = java.nio.file.Files.createTempDirectory(s"ssbench_$users").toString
      val in = s"$root/in"; val cp = s"$root/cp"
      new java.io.File(in).mkdirs()
      // stage Batches parquet drops, each touching every user once
      (0 until Batches).foreach { b =>
        spark.range(users).select(col("id").as("user_id"))
          .coalesce(8)
          .write.mode("overwrite").parquet(s"$root/stage")
        // move the parts into a per-batch subdir the file stream admits
        // together (maxFilesPerTrigger below = parts per batch)
        val staged = new java.io.File(s"$root/stage").listFiles()
          .filter(_.getName.startsWith("part-"))
        val bdir = new java.io.File(in, f"b$b%02d"); bdir.mkdirs()
        staged.foreach(p => java.nio.file.Files.move(p.toPath,
          new java.io.File(bdir, p.getName).toPath))
      }
      val undo = if (rocks) Some(StateStores.useRocksDb(spark)) else None
      try {
        val schema = StructType(Seq(StructField("user_id", LongType)))
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "8") // one staged batch's files
          .parquet(s"$in/b*")
        val t0 = System.nanoTime()
        val q = EventStreamOps.runningUserCounts(stream.select(col("user_id")))
          .writeStream.outputMode(EventStreamOps.runningCountsMode)
          .option("checkpointLocation", cp)
          .format("noop").start()
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val prog = q.lastProgress
        val so = prog.stateOperators(0)
        q.stop()
        val stateBytes = dirSize(new java.io.File(s"$cp/state"))
        val nBatches = prog.batchId + 1
        println(s"""{"bench":"state_store","provider":"${if (rocks) "rocksdb" else "hdfs"}","users":$users,"batches":$nBatches,"events":${users * Batches},"sec":${r3(sec)},"rows_per_sec":${r3(users * Batches / sec)},"state_rows":${so.numRowsTotal},"state_mem_bytes":${so.memoryUsedBytes},"ckpt_state_bytes":$stateBytes,"ckpt_bytes_per_batch":${stateBytes / math.max(1, nBatches)}}""")
      } finally {
        undo.foreach(_.apply())
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
    }
    spark.stop()
  }
}
