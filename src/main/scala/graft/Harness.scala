package graft
import org.apache.spark.sql.SparkSession

/** Shared session construction + inter-query housekeeping for the
  * harness mains (Bench / Verify / RunQuery / TimeQuery / Smoke).
  * Previously each main hand-maintained an identical builder block and
  * housekeeping sequence; a fix landing in one copy and not another
  * (e.g. the BPE memo clear) silently skews that entry point's
  * numbers. One definition, one place to fix. */
object Harness {

  /** The one local session shape every main uses: graft extensions,
    * `local[SPARK_GRAFT_CPUS]` (default 32), shuffle partitions =
    * cpus (NOT the 200 default — see SURVEY §9 config row), AQE with
    * small-partition coalescing, UTC, no UI.
    * @param warm run one tiny job to absorb session/codegen/committer
    *   init, so timed queries measure the queries (Bench-style mains) */
  def session(warm: Boolean = false): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // opt into RELIABLE checkpoints for the iterative kernels from the
    // environment (the A/B lever for Iterate's two modes; housekeeping
    // clears the dir's contents between queries)
    sys.env.get("GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty)
      .foreach(d => s.conf.set("graft.checkpoint.dir", d))
    if (warm) s.range(1000000).selectExpr("sum(id)").collect()
    s
  }

  /** Between-queries housekeeping (run OUTSIDE any timer): drop
    * persisted frames/caches a query left behind and give the
    * ContextCleaner a GC so accumulated broadcast/shuffle state is
    * actually released — without this, driver-side state from ~25+
    * queries in one JVM degrades later queries by an order of
    * magnitude (observed at sf0.1; thread counts growing ~10/query
    * are the symptom).
    * @param clearMemos also drop JVM-side memos (the BPE merge
    *   table) so a TIMED rep pays its query's full cost; correctness
    *   paths (Verify) keep memos — they measure results, not time,
    *   and the memo key already fingerprints the source file */
  def housekeeping(spark: SparkSession, clearMemos: Boolean = true): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    if (clearMemos) graft.operators.TextAnalytics.clearMemos()
    // reliable-mode checkpoint data is never GC'd by Spark itself
    // (see Iterate.scala scaladoc) — between queries no checkpointed
    // lineage is live, so the whole dir's contents can go
    graft.operators.Iterate.clearCheckpoints(spark)
    System.gc()
  }
}
