package graft

import java.io.File
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The graft-objects DataSourceV2 write path (K4/M2 — the reference's
  * S3 put, SURVEY §2.3): staged task writes, driver job commit,
  * truncate-on-overwrite, and no partial visibility after a failed
  * job. Round-trips with the graft-pages reader. */
class ObjectSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(): File = {
    val d = Files.createTempDirectory("graft_objects_spec").toFile
    d.deleteOnExit(); d
  }

  test("append: one object per row, content intact, staging cleaned") {
    val dir = tmpDir()
    import spark.implicits._
    Seq(("img/1.jpg", "payload-one"), ("img/2.jpg", "payload-two"))
      .toDF("key", "payload")
      .write.format("graft-objects").mode("append").save(dir.getPath)
    val objs = graft.sources.ObjectSink.listObjects(dir.getPath)
    assert(objs.map(_.getName) == Seq("img%2F1.jpg", "img%2F2.jpg"))
    assert(new String(Files.readAllBytes(objs.head.toPath), "UTF-8") == "payload-one")
    // no staging dirs and no hidden commit temps survive a committed job
    assert(!dir.listFiles().exists(_.getName.startsWith(".staging")))
    assert(!dir.listFiles().exists(_.getName.startsWith(".commit-")))
  }

  test("key flattening is injective: 'a/b' and a literal collision candidate stay distinct") {
    val dir = tmpDir()
    import spark.implicits._
    // under a lossy "__"-flattening these three keys would collide;
    // the percent-encoding (with '%' itself escaped) keeps the map
    // injective, so three distinct objects land
    Seq(("a/b", "slash"), ("a%2Fb", "literal-pct"), ("a\\b", "backslash"))
      .toDF("key", "payload")
      .write.format("graft-objects").mode("append").save(dir.getPath)
    val objs = graft.sources.ObjectSink.listObjects(dir.getPath)
    assert(objs.map(_.getName).toSet ==
      Set("a%2Fb", "a%252Fb", "a%5Cb"))
  }

  test("a key written twice keeps the last payload — put semantics, no commit crash") {
    val dir = tmpDir()
    import spark.implicits._
    // same key twice in ONE partition: must not stage a duplicate move
    // (which would crash job commit) and must keep the later payload
    Seq(("k.txt", "first"), ("k.txt", "second"))
      .toDF("key", "payload").coalesce(1)
      .write.format("graft-objects").mode("append").save(dir.getPath)
    val objs = graft.sources.ObjectSink.listObjects(dir.getPath)
    assert(objs.map(_.getName) == Seq("k.txt"))
    assert(new String(Files.readAllBytes(objs.head.toPath), "UTF-8") == "second")
  }

  test("overwrite truncates existing objects atomically at job commit") {
    val dir = tmpDir()
    import spark.implicits._
    Seq(("old.txt", "old")).toDF("key", "payload")
      .write.format("graft-objects").mode("append").save(dir.getPath)
    Seq(("new.txt", "new")).toDF("key", "payload")
      .write.format("graft-objects").mode("overwrite").save(dir.getPath)
    assert(graft.sources.ObjectSink.listObjects(dir.getPath)
      .map(_.getName) == Seq("new.txt"))
  }

  test("a failed job leaves NO visible objects and no staging debris") {
    val dir = tmpDir()
    import spark.implicits._
    val boom = udf((k: String) =>
      if (k == "poison") throw new RuntimeException("boom") else k)
    intercept[Exception] {
      Seq("ok1", "ok2", "poison").toDF("key")
        .withColumn("key", boom(col("key")))
        .withColumn("payload", lit("x"))
        .write.format("graft-objects").mode("append").save(dir.getPath)
    }
    assert(graft.sources.ObjectSink.listObjects(dir.getPath).isEmpty,
      "partial objects visible after failed job")
    assert(!dir.exists() || !dir.listFiles().exists(_.getName.startsWith(".staging")),
      "staging debris after abort")
  }

  test("keys with a leading '.' or '_' stay visible (no silent un-listable put)") {
    val dir = tmpDir()
    import spark.implicits._
    // unencoded these names fall into the sink's hidden namespace:
    // written fine, but invisible to listObjects and immune to
    // overwrite truncation forever
    Seq(("_meta", "m"), (".hidden", "h"), ("normal.txt", "n"))
      .toDF("key", "payload")
      .write.format("graft-objects").mode("append").save(dir.getPath)
    val objs = graft.sources.ObjectSink.listObjects(dir.getPath)
    assert(objs.map(_.getName).toSet == Set("%5Fmeta", "%2Ehidden", "normal.txt"))
    assert(new String(Files.readAllBytes(
      objs.find(_.getName == "%2Ehidden").get.toPath), "UTF-8") == "h")
    // and overwrite truncation can actually clear them
    Seq(("only.txt", "x")).toDF("key", "payload")
      .write.format("graft-objects").mode("overwrite").save(dir.getPath)
    assert(graft.sources.ObjectSink.listObjects(dir.getPath)
      .map(_.getName) == Seq("only.txt"))
  }

  test("commit never reaps a concurrent job's fresh parked files, only dead debris") {
    val dir = tmpDir()
    dir.mkdirs()
    import spark.implicits._
    // a concurrent append job mid-commit: its phase-1 parked file is
    // FRESH — deleting it would yank the only staged copy out from
    // under that job's phase 2
    val live = new File(dir, ".commit-other-live-job-0")
    Files.writeString(live.toPath, "live parked payload")
    // dead debris: same shape but older than any plausible commit
    val dead = new File(dir, ".commit-other-dead-job-0")
    Files.writeString(dead.toPath, "crashed long ago")
    dead.setLastModified(System.currentTimeMillis() -
      graft.sources.ObjectSink.FOREIGN_DEBRIS_MIN_AGE_MS - 60000)
    Seq(("a.txt", "x")).toDF("key", "payload")
      .write.format("graft-objects").mode("append").save(dir.getPath)
    assert(live.exists(), "a live concurrent job's parked file was reaped")
    assert(!dead.exists(), "aged debris should have been reaped")
  }

  test("abort after a phase-2 crash rolls FORWARD: parked payloads are never the casualty") {
    // drive the driver-side coordinator directly to stage the exact
    // crash window: old objects truncated, marker written, flips not
    // yet done — abort must complete the flips (the parked files are
    // the only copy), not delete them
    import graft.sources.ObjectBatchWrite
    val dir = tmpDir()
    dir.mkdirs()
    val parked = new File(dir, ".commit-q1-0")
    Files.writeString(parked.toPath, "the only copy")
    Files.writeString(new File(dir, ".commit-q1-PHASE2").toPath,
      ".commit-q1-0\tfinal.txt")
    new ObjectBatchWrite(dir.getPath, "q1", truncateFirst = true).abort(Array.empty)
    val objs = graft.sources.ObjectSink.listObjects(dir.getPath)
    assert(objs.map(_.getName) == Seq("final.txt"))
    assert(new String(Files.readAllBytes(objs.head.toPath), "UTF-8") == "the only copy")
    assert(!new File(dir, ".commit-q1-PHASE2").exists())
    // contrast: BEFORE the marker exists (phase 1 crash), old data is
    // intact and abort rolls BACK by discarding the parked file
    val dir2 = tmpDir()
    dir2.mkdirs()
    Files.writeString(new File(dir2, "old.txt").toPath, "old")
    Files.writeString(new File(dir2, ".commit-q2-0").toPath, "discarded")
    new ObjectBatchWrite(dir2.getPath, "q2", truncateFirst = true).abort(Array.empty)
    assert(graft.sources.ObjectSink.listObjects(dir2.getPath)
      .map(_.getName) == Seq("old.txt"))
    assert(!new File(dir2, ".commit-q2-0").exists())
  }

  test("round-trip: objects written here read back as pages (fetch -> put -> scan)") {
    val dir = tmpDir()
    import spark.implicits._
    Seq(("page_a.json", """{"graphql": null, "data": null}"""),
        ("page_b.json", """{"x": 1}"""))
      .toDF("key", "payload")
      .write.format("graft-objects").mode("append").save(dir.getPath)
    val back = spark.read.format("graft-pages").load(dir.getPath)
      .select(col("path"), col("payload")).collect()
    assert(back.length == 2)
    assert(back.forall(r => r.getString(1).nonEmpty))
  }
}
