package graft

import org.apache.spark.sql.SparkSession

/** Production session factory: one place for the config posture described
  * in SCALE.md, so every entry point (Verify, Bench, a user's driver)
  * starts from the same tuned baseline instead of re-deriving it.
  *
  * Everything here is a default — callers can still override any key on
  * the returned builder before `getOrCreate()`.
  */
object GraftSession {

  /** @param cores parallelism for local mode; on a cluster pass 0 and set
    *              master/resources externally (spark-submit) — the SQL
    *              knobs still apply. */
  def builder(appName: String = "graft", cores: Int = 0)
      : SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      // deterministic timestamp semantics (oracle parity + sane pipelines)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE: runtime re-planning, skew-join split, partition coalescing
      .config("spark.sql.adaptive.enabled", "true")
      // probe-side pruning for selective dim joins (see ScaleJoinsSpec)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // graft_* SQL functions available in every session
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    if (cores > 0)
      b.master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
    else b
  }
}
