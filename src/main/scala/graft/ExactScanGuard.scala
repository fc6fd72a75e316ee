package graft

import org.apache.spark.sql.SparkSession

/** Fail-fast guard for the library's two DECLARED O(n²) exact baselines
  * (`dedup_embcos`, `sim_topk_bruteforce`). Both are registered
  * small-corpus ground-truth queries whose compute grows quadratically by
  * contract — right for recall measurement, unrunnable at production
  * corpus sizes, where their registered linear/approximate twins are the
  * production route. Previously they ran unconditionally at any n; an
  * accidental invocation over a 10⁹-row corpus would silently burn a
  * cluster for days. Above [[DefaultMaxRows]] vectors the guard now fails
  * fast, NAMING the registered twin to run instead (VERDICT r13 #6).
  *
  * Opt-out for deliberate large exact runs: set the session conf
  * `spark.graft.exactBaseline.maxRows` to a higher bound, or to `-1` to
  * disable the guard entirely. Every driver SF (≤20k vectors) sits far
  * below the default, so gated queries never see the guard.
  */
object ExactScanGuard {

  val ConfKey = "spark.graft.exactBaseline.maxRows"
  val DefaultMaxRows = 1000000L

  /** Throws [[IllegalStateException]] if `n` rows exceed the configured
    * bound for exact-baseline query `query`; the message points at
    * `twin`, its registered sub-quadratic production twin. */
  def check(s: SparkSession, query: String, twin: String, n: Long): Unit = {
    val max = s.conf.getOption(ConfKey).map(_.toLong).getOrElse(DefaultMaxRows)
    if (max >= 0 && n > max)
      throw new IllegalStateException(
        s"$query is a declared O(n^2) exact baseline and refuses to run over " +
        s"$n rows (limit $max). For production-scale corpora run its " +
        s"registered sub-quadratic twin '$twin' instead, or raise/disable " +
        s"the bound via the session conf $ConfKey (-1 disables).")
  }
}
