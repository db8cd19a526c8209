package graft.operators

import org.apache.spark.sql.DataFrame

/** Plan truncation for iterative kernels (connected components, label
  * propagation, PageRank/HITS, BFS/SSSP, k-core): each round's frame
  * must be materialized with its lineage CUT, or the logical plan
  * doubles per round and the driver dies planning round ~20.
  *
  * Two materialization modes, chosen by the `graft.checkpoint.dir`
  * session conf:
  *
  *   - unset (default, and the right call on local[n]):
  *     `localCheckpoint(eager)` — blocks live on executor block
  *     managers, no filesystem round-trip. On a real cluster a lost
  *     executor loses its blocks AND the truncated lineage that could
  *     recompute them — the job dies. Fine single-JVM, wrong at scale.
  *
  *   - set to a (fault-tolerant) directory: reliable
  *     `checkpoint(eager)` — blocks are written to the directory, so
  *     a lost executor re-reads instead of failing the job. This is
  *     the 1000-executor posture; the dir should be on the cluster FS
  *     (HDFS/S3), never executor-local disk.
  *
  * The knob is read per call, so a session can flip modes between
  * queries; the SparkContext checkpoint dir is (re)set only when the
  * conf value changes. Both modes are eager — every kernel counts on
  * rounds materializing before the next round's self-reference.
  */
object Iterate {

  // last dir actually pushed to SparkContext, to avoid re-resolving
  // the path every round (setCheckpointDir does FS calls)
  @volatile private var lastDir: String = null

  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("graft.checkpoint.dir") match {
      case Some(dir) if dir.nonEmpty =>
        if (dir != lastDir) synchronized {
          if (dir != lastDir) {
            s.sparkContext.setCheckpointDir(dir)
            lastDir = dir
          }
        }
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
  }

  /** `.cut()` chaining syntax so kernel code reads like the
    * `.localCheckpoint(true)` it replaces. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cut(): DataFrame = Iterate.cut(df)
  }
}
