package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the stateful streaming jobs.
  *
  * Spark's default `HDFSBackedStateStoreProvider` (what the reference's
  * shipped `checkpoint/` ran — SURVEY §2.2 K4) keeps every key's latest
  * version on the executor HEAP. That is fine for bounded windowed aggs,
  * but the no-watermark faithful jobs (TaxiJobs) and any
  * high-cardinality keyed state grow heap-resident state for the
  * lifetime of the run — at 100 TB streaming state the provider of
  * record is RocksDB: state lives on executor-local disk with bounded
  * block-cache memory, and changelog checkpointing ships per-batch
  * deltas instead of full SST snapshots, so checkpoint cost tracks the
  * CHANGE rate, not the state size.
  *
  * Opt-in (`SPARK_GRAFT_STATE_STORE=rocksdb` on the runnable apps, or
  * [[useRocksDb]] on an existing session) rather than default, so the
  * taxi-fidelity jobs keep the reference's provider unless asked;
  * recovery semantics on the RocksDB provider are pinned by
  * RecoverySpec ("sessionizer recovers on RocksDB ...").
  */
object StateStores {
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val RocksDbConfs: Seq[(String, String)] = Seq(
    "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
    // deltas-per-checkpoint instead of full snapshots: restart cost
    // proportional to changed keys, the property that matters once
    // state no longer fits one machine's heap
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  /** True when the runnable apps were asked for the RocksDB provider. */
  def rocksDbRequested: Boolean =
    sys.env.get("SPARK_GRAFT_STATE_STORE").exists(_.equalsIgnoreCase("rocksdb"))

  /** Set the RocksDB provider confs on an existing session. Returns an
    * undo closure restoring the prior values — the provider is read per
    * query START, so tests scope it to one stream without leaking into
    * the shared session. */
  def useRocksDb(spark: SparkSession): () => Unit = {
    val saved = RocksDbConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    RocksDbConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    () =>
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
  }
}
