package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one query N times and optionally print its plan.
  * Usage: RunQuery <name> [sfDir] [reps] [explain]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val doExplain = args.contains("explain")
    val spark = Harness.session(warm = true)
    name.split(",").foreach { nm =>
      val fn = SparkEntry.queries(nm)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      if (args.contains("show")) fn(spark, sfDir).show(5, false)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[$nm] rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
        Harness.housekeeping(spark)
      }
    }
    spark.stop()
  }
}
