package graft
import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer: `tools/run.sh graft.TimeQuery <sfDir>
  * <name>[,<name>...] [reps]` — same session shape and inter-rep
  * housekeeping as Bench, but scoped to the named queries so a perf
  * diagnosis doesn't pay for the whole 115-query sweep. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Harness.session(warm = true)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Harness.housekeeping(spark)
        dt
      }
      println(f"$name: min=${times.min}%.3f s  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
