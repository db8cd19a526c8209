package graft

/** Dev-only A/B harness for the walk-family lineage-cut cadence
  * (VERDICT r14 item 4): flips graft.walk.ckpt.every BETWEEN calls
  * inside ONE warm session (the sysprop is read per call), so the
  * comparison never pays cross-session JVM variance. Usage:
  * `tools/run.sh graft.CadenceAB <sfDir> [reps]`. */
object CadenceAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cadences =
      if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
      else Seq(1, 2, 3, 7)
    val names = Seq("q_ann_beam", "q_ann_layered", "q_ann_delete",
      "q_ann_filtered")
    val spark = Harness.session(warm = true)
    // warmup: one full pass at the default so codegen/shuffle paths
    // are hot before anything is timed
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count()
      Harness.housekeeping(spark)
    }
    val results = scala.collection.mutable.Map
      .empty[(String, Int), Seq[Double]].withDefaultValue(Seq.empty)
    // interleave: cadence is the inner loop so slow host drift hits
    // every arm equally
    for (r <- 1 to reps; name <- names; cad <- cadences) {
      sys.props("graft.walk.ckpt.every") = cad.toString
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Harness.housekeeping(spark)
      results((name, cad)) = results((name, cad)) :+ dt
      System.err.println(f"[cad] rep$r $name cad=$cad ${dt}%.3f s")
    }
    sys.props -= "graft.walk.ckpt.every"
    println("query,cadence,min_s,all")
    for (name <- names; cad <- cadences) {
      val ts = results((name, cad))
      println(f"$name,$cad,${ts.min}%.3f," +
        ts.map(t => f"$t%.3f").mkString("|"))
    }
    val perCad = cadences.map { cad =>
      cad -> names.map(n => results((n, cad)).min).sum
    }
    perCad.foreach { case (c, t) =>
      println(f"TOTAL cadence=$c min-sum=${t}%.3f s") }
    spark.stop()
  }
}
