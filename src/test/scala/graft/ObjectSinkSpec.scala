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
