package graft.tools

import graft.streaming.{EventStreamOps, StateStores}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * drops; user cardinality swept via SPARK_GRAFT_SS_USERS (default
  * 200k/1M/2M).
  *
  * Two regimes:
  *
  *   - DENSE (default): every batch touches EVERY user — the changelog
  *     WORST case, where per-batch changelog bytes equal the full map by
  *     construction (measured r17, BASELINE.md).
  *   - SPARSE (`SPARK_GRAFT_SS_SPARSE=0.01`): batch 0 touches every user
  *     (builds the resident state), then [[SparseBatches]] batches each
  *     touch a DIFFERENT ~1% stride-scattered key subset — the regime
  *     where changelog checkpointing should win (few keys touched, large
  *     resident state; VERDICT r17 #5). Reported rows/s and checkpoint
  *     bytes/batch are over the sparse phase only (bootstrap reported
  *     separately); 12 sparse batches cross the HDFS provider's
  *     minDeltasForSnapshot=10 so its background full-snapshot cost is
  *     inside the measured window, not hidden after it.
  *
  * Per (provider, users) cell, one JSON line with rows/s,
  * provider-reported state memory, and on-disk checkpoint bytes/batch.
  *
  * Run: SPARK_GRAFT_SS_USERS=1000000 SPARK_GRAFT_SS_SPARSE=0.01 sbt
  * "runMain graft.tools.StateStoreBench". Timing-sensitive: run alone.
  */
object StateStoreBench {
  private val Batches = 4        // dense-mode drops
  private val SparseBatches = 12 // sparse-mode update drops after bootstrap

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
    val sparseFrac = sys.env.get("SPARK_GRAFT_SS_SPARSE").map(_.toDouble)

    /** Stage one file drop under `in/<name>`: exactly 8 part files
      * (repartition, not coalesce — coalesce(8) yields
      * min(inputPartitions, 8) files and with SPARK_GRAFT_CPUS < 8 one
      * trigger would span staged drops, skewing per-batch metrics;
      * ADVICE r17). Returns the COUNTED part files, which is what
      * maxFilesPerTrigger is set from — never an assumed constant. */
    def stageDrop(df: DataFrame, root: String, name: String): Int = {
      df.repartition(8).write.mode("overwrite").parquet(s"$root/stage")
      val staged = new java.io.File(s"$root/stage").listFiles()
        .filter(_.getName.startsWith("part-"))
      val bdir = new java.io.File(s"$root/in", name); bdir.mkdirs()
      staged.foreach(p => java.nio.file.Files.move(p.toPath,
        new java.io.File(bdir, p.getName).toPath))
      staged.length
    }

    for (users <- userCounts; rocks <- Seq(false, true)) {
      val root = java.nio.file.Files.createTempDirectory(s"ssbench_$users").toString
      val in = s"$root/in"; val cp = s"$root/cp"
      new java.io.File(in).mkdirs()
      val undo = if (rocks) Some(StateStores.useRocksDb(spark)) else None
      try {
        val schema = StructType(Seq(StructField("user_id", LongType)))
        def startQuery(filesPerTrigger: Int) = {
          val stream = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", filesPerTrigger.toString)
            .parquet(s"$in/b*")
          EventStreamOps.runningUserCounts(stream.select(col("user_id")))
            .writeStream.outputMode(EventStreamOps.runningCountsMode)
            .option("checkpointLocation", cp)
            .format("noop").start()
        }
        val provider = if (rocks) "rocksdb" else "hdfs"

        sparseFrac match {
          case None =>
            // DENSE: Batches drops, each touching every user once.
            val counts = (0 until Batches).map { b =>
              stageDrop(spark.range(users).select(col("id").as("user_id")),
                root, f"b$b%03d")
            }
            require(counts.distinct.size == 1,
              s"staged drops have unequal file counts: $counts")
            val t0 = System.nanoTime()
            val q = startQuery(counts.head)
            q.processAllAvailable()
            val sec = (System.nanoTime() - t0) / 1e9
            val prog = q.lastProgress
            val so = prog.stateOperators(0)
            q.stop()
            val stateBytes = dirSize(new java.io.File(s"$cp/state"))
            val nBatches = prog.batchId + 1
            println(s"""{"bench":"state_store","mode":"dense","provider":"$provider","users":$users,"batches":$nBatches,"events":${users * Batches},"sec":${r3(sec)},"rows_per_sec":${r3(users * Batches / sec)},"state_rows":${so.numRowsTotal},"state_mem_bytes":${so.memoryUsedBytes},"ckpt_state_bytes":$stateBytes,"ckpt_bytes_per_batch":${stateBytes / math.max(1, nBatches)}}""")

          case Some(frac) =>
            // SPARSE: bootstrap drop touches every user; then
            // SparseBatches drops each touch a stride-scattered ~frac
            // subset, a DIFFERENT one per drop (realistic update streams
            // scatter across the key space, and distinct subsets keep
            // every sparse delta genuinely new keys' updates).
            val stride = math.max(1L, math.round(1.0 / frac))
            val perBatch = users / stride
            val bootFiles = stageDrop(
              spark.range(users).select(col("id").as("user_id")), root, "b000")
            val q = startQuery(bootFiles)
            val t0 = System.nanoTime()
            q.processAllAvailable()
            val bootSec = (System.nanoTime() - t0) / 1e9
            val stateAfterBoot = dirSize(new java.io.File(s"$cp/state"))
            val memAfterBoot = q.lastProgress.stateOperators(0).memoryUsedBytes
            val bootBatches = q.lastProgress.batchId + 1
            // stage sparse drops while the query runs; equal file counts
            // keep one drop per trigger
            val sparseCounts = (1 to SparseBatches).map { b =>
              stageDrop(spark.range(perBatch)
                .select((col("id") * stride + (b % stride)).as("user_id")),
                root, f"b$b%03d")
            }
            require((sparseCounts :+ bootFiles).distinct.size == 1,
              s"staged drops have unequal file counts: boot=$bootFiles sparse=$sparseCounts")
            val t1 = System.nanoTime()
            q.processAllAvailable()
            val sparseSec = (System.nanoTime() - t1) / 1e9
            val prog = q.lastProgress
            val so = prog.stateOperators(0)
            q.stop()
            val stateBytes = dirSize(new java.io.File(s"$cp/state"))
            val sparseBatchesRun = prog.batchId + 1 - bootBatches
            val sparseRows = perBatch * SparseBatches
            println(s"""{"bench":"state_store","mode":"sparse","provider":"$provider","users":$users,"frac":$frac,"rows_per_sparse_batch":$perBatch,"boot_sec":${r3(bootSec)},"sparse_batches":$sparseBatchesRun,"sparse_sec":${r3(sparseSec)},"sparse_rows_per_sec":${r3(sparseRows / sparseSec)},"state_rows":${so.numRowsTotal},"state_mem_bytes":${so.memoryUsedBytes},"ckpt_bytes_boot":$stateAfterBoot,"state_mem_bytes_boot":$memAfterBoot,"ckpt_bytes_sparse_total":${stateBytes - stateAfterBoot},"ckpt_bytes_per_sparse_batch":${(stateBytes - stateAfterBoot) / math.max(1, sparseBatchesRun)}}""")
        }
      } finally {
        undo.foreach(_.apply())
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
    }
    spark.stop()
  }
}
