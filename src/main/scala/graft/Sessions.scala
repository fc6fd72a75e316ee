package graft

/** Shared session-tuning values for the batch mains (Bench / Verify and
  * the dev measurement tools). */
object Sessions {

  /** Scratch directory for shuffle and spill files (`spark.local.dir`).
    *
    * Optimization guide §2.1: "Local disk bandwidth for shuffle files can
    * be the tighter limit on machines with slow disks — check both." On
    * this sandbox it IS the limit — /tmp sits on a virtio ext4 disk whose
    * file syscalls are slow, and r22 thread dumps of the hot 32-task
    * stages caught the RUNNABLE executor threads inside shuffle-file
    * syscalls (`FileOutputStream.open0`, `FileDispatcherImpl.write0`,
    * `FileChannelImpl.map0/unmap0`, `UnixFileSystem.delete0`), not inside
    * query compute. /dev/shm is RAM-backed (tmpfs); moving the shuffle
    * dirs there removed that term (r22 QueryBench, adjacent runs:
    * `text_tfidf_topk` 1.69 → 0.98 s, `sim_pq_codes` 2.41 → 1.81 s).
    *
    * Safe here by arithmetic, not assumption: the bench SF's total
    * shuffle volume is a few MB per query against a 126 GiB tmpfs. On a
    * production cluster this must point at the fastest LOCAL DISK array
    * (NVMe), not tmpfs — at 100 TB shuffle data cannot live in RAM —
    * hence the env parameterization rather than a hard-coded path. */
  def localDir: String =
    sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-spark-local"
      else System.getProperty("java.io.tmpdir", "/tmp")
    })
}
