package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The `graft.checkpoint.dir` knob (operators/Iterate.scala): unset →
  * localCheckpoint (executor blocks, local-mode default); set → a
  * RELIABLE checkpoint() into the configured fault-tolerant dir, the
  * lost-executor-safe posture for iterative kernels on a real
  * cluster. The contract under test: the knob is honored (files
  * actually land in the dir) and results are mode-invariant. */
class CheckpointModeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withCheckpointDir[A](dir: String)(f: => A): A = {
    spark.conf.set("graft.checkpoint.dir", dir)
    try f finally spark.conf.unset("graft.checkpoint.dir")
  }

  test("reliable mode writes into graft.checkpoint.dir and results are unchanged") {
    val base = Dedup.queries("q_cc_stars")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    TestSpark.housekeeping()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    try {
      val reliable = withCheckpointDir(dir.getAbsolutePath) {
        Dedup.queries("q_cc_stars")(spark, TestSpark.sf)
          .collect().map(_.toSeq).toSet
      }
      assert(reliable == base)
      // checkpoint() must have materialized RDDs under the dir
      def allFiles(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(allFiles) else Seq(f)
      val parts = allFiles(dir).filter(_.getName.startsWith("part-"))
      assert(parts.nonEmpty,
        s"no checkpoint part files under ${dir.getAbsolutePath}")
    } finally {
      TestSpark.housekeeping()
      Fs.deleteRec(dir)
    }
  }

  test("clearCheckpoints reclaims accumulated reliable-checkpoint data between queries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-gc").toFile
    try {
      withCheckpointDir(dir.getAbsolutePath) {
        Dedup.queries("q_cc_stars")(spark, TestSpark.sf).collect()
        assert(dir.listFiles().nonEmpty, "no checkpoint data accumulated")
        // Spark never GCs non-streaming checkpoints on its own
        // (Iterate.scala scaladoc) — the housekeeping hook must
        graft.operators.Iterate.clearCheckpoints(spark)
        assert(dir.listFiles().isEmpty,
          "checkpoint contents must be reclaimed")
        assert(dir.isDirectory, "the configured dir itself must survive")
        // and the NEXT reliable-mode query still works after the sweep
        val again = Dedup.queries("q_cc_stars")(spark, TestSpark.sf).count()
        assert(again > 0)
      }
    } finally {
      TestSpark.housekeeping()
      Fs.deleteRec(dir)
    }
  }

  test("iterative kernel still runs with the knob unset (local mode)") {
    assert(spark.conf.getOption("graft.checkpoint.dir").isEmpty)
    val rows = Dedup.queries("q_dedup_clusters")(spark, TestSpark.sf).count()
    TestSpark.housekeeping()
    assert(rows > 0)
  }
}
