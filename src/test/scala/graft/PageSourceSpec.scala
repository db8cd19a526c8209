package graft

import java.io.File
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The graft-pages DataSourceV2 connector (S1 — the reference's
  * cron-driven page-fetch boundary, SURVEY §2.2): batch read, column
  * pruning that skips payload I/O, path-filter file pruning, and the
  * incremental micro-batch replay that models the reference's 3-hourly
  * cron runs (main.js:35-39) — each AvailableNow restart processes only
  * the pages fetched since the last checkpointed run. */
class PageSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(name: String): String = {
    val p = new File(getClass.getResource(s"/fixtures/$name").toURI)
    new String(Files.readAllBytes(p.toPath), "UTF-8")
  }

  /** A temp "fetch directory" with both TagPage dialect fixtures, with
    * controlled mtimes (graphql older than data). */
  private def fetchDir(): File = {
    val dir = Files.createTempDirectory("graft_pages_spec").toFile
    dir.deleteOnExit()
    val a = new File(dir, "page_graphql.json")
    Files.writeString(a.toPath, fixture("tagpage_graphql.json"))
    a.setLastModified(1000000L)
    val b = new File(dir, "page_data.json")
    Files.writeString(b.toPath, fixture("tagpage_data.json"))
    b.setLastModified(2000000L)
    dir
  }

  test("batch read: one row per page file, payloads parse downstream") {
    val dir = fetchDir()
    val df = spark.read.format("graft-pages").load(dir.getPath)
    assert(df.schema.fieldNames.toSeq ==
      Seq("path", "mtime_ms", "length", "payload"))
    val rows = df.orderBy("mtime_ms").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0).endsWith("page_graphql.json"))
    assert(rows(1).getString(0).endsWith("page_data.json"))
    assert(rows.forall(r => r.getLong(2) > 0 && r.getString(3).nonEmpty))
    // the payload column feeds the S2 dialect dispatch exactly like the
    // driver replay: both dialects must yield posts
    val posts = graft.operators.Ingest.postsFromParsed(
      graft.operators.Ingest.parseTagPage(
        df.select(col("payload").as("json"))), "spec")
    assert(posts.count() > 0)
  }

  test("column pruning reaches the reader: metadata query never opens payloads") {
    val dir = fetchDir()
    val df = spark.read.format("graft-pages").load(dir.getPath)
      .select(col("path"), col("length"))
    assert(df.count() == 2)
    // the scan's advertised schema really is pruned...
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PrunedColumns=path,length"), scan.take(2000))
    // ...and the I/O-skip contract holds at the reader itself: a
    // pruned reader over a NONEXISTENT file yields its metadata row
    // without touching the filesystem (an unreadable-file probe can't
    // test this — as root, permission bits don't block reads), while
    // a payload-bearing reader over the same file must throw
    import graft.sources.{PageFile, PagePartition, PageReaderFactory}
    import org.apache.spark.sql.types.StructType
    val ghost = PagePartition(PageFile(s"${dir.getPath}/never_written.json", 9L, 3L))
    val pruned = StructType(graft.sources.PageSource.SCHEMA
      .filter(f => f.name == "path" || f.name == "length"))
    val r = new PageReaderFactory(pruned).createReader(ghost)
    assert(r.next())
    assert(r.get().numFields == 2) // no exception: payload never opened
    val full = new PageReaderFactory(graft.sources.PageSource.SCHEMA)
      .createReader(ghost)
    assert(full.next())
    intercept[java.io.IOException](full.get())
    // ...and END-TO-END through a real query (local mode shares the
    // JVM, so the reader-side counter is visible here): the pruned
    // query opened zero payload files, the full query opened both
    val opens0 = graft.sources.PageSource.payloadOpens.get()
    assert(spark.read.format("graft-pages").load(dir.getPath)
      .select(col("path"), col("length")).collect().length == 2)
    assert(graft.sources.PageSource.payloadOpens.get() == opens0,
      "a metadata-only query opened payload files")
    assert(spark.read.format("graft-pages").load(dir.getPath)
      .select(col("payload")).collect().length == 2)
    assert(graft.sources.PageSource.payloadOpens.get() == opens0 + 2)
  }

  test("path filters prune the file listing itself") {
    val dir = fetchDir()
    val df = spark.read.format("graft-pages").load(dir.getPath)
      .filter(col("path").startsWith(s"${dir.getPath}/page_data"))
    assert(df.count() == 1)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters=[StringStartsWith(path,"), scan.take(2000))
    // pruned at PLANNING: one input partition, not a post-scan filter of 2
    val parts = df.rdd.getNumPartitions
    assert(parts == 1, s"expected 1 planned partition, got $parts")
  }

  test("the whole cron loop: connector -> dialect parse -> incremental MERGE") {
    // The reference's operating mode end-to-end (main.js:35-39 cron →
    // posts-from-hashtags.js fetch/parse/upsert), every stage real:
    // fetched pages land in a directory (graft-pages connector), each
    // AvailableNow run parses ONLY the new pages (both §1.4 dialects)
    // and MERGEs them into the post store, latest run wins per id.
    import graft.operators.Ingest
    import graft.streaming.EventsStream
    val dir = fetchDir()
    val ckpt = Files.createTempDirectory("graft_loop_ckpt").toFile
    val store = new File(Files.createTempDirectory("graft_loop_store").toFile, "posts")
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-pages").load(dir.getPath)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.getPath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (pages: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val posts = Ingest.postsFromParsed(
            Ingest.parseTagPage(pages.select(col("payload").as("json"))), "cron")
            .withColumn("seen_in_batch", lit(batchId))
          EventsStream.mergeLatestIntoParquet(spark, store.getPath,
            "id", "seen_in_batch", "likeCount")(posts, batchId)
          ()
        }.start()
      q.awaitTermination()
    }
    // run 1: both dialect fixture pages → their posts are stored
    runOnce()
    val after1 = spark.read.parquet(store.getPath)
      .select(col("id"), col("likeCount")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after1.nonEmpty && after1.contains("26934"),
      s"graphql-dialect post missing from store: ${after1.keySet}")
    // a later fetch re-observes post 26934 with a higher like count
    val update = new File(dir, "page_update.json")
    Files.writeString(update.toPath,
      """{"graphql": {"hashtag": {"edge_hashtag_to_media": {"edges": [
        |  {"node": {"id": "26934", "shortcode": "CRx1",
        |    "thumbnail_src": "https://cdn.example/p1.jpg",
        |    "accessibility_caption": "Photo of tacos on a table",
        |    "__typename": "GraphImage",
        |    "edge_media_preview_like": {"count": 99},
        |    "edge_media_to_comment": {"count": 8},
        |    "edge_media_to_caption": {"edges": [{"node": {"text": "Tacos!"}}]}
        |  }}]}}}}""".stripMargin)
    update.setLastModified(5000000L)
    // run 2 (same checkpoint): parses ONLY the new page, merge updates
    // 26934 in place and leaves every other stored post untouched
    runOnce()
    val after2 = spark.read.parquet(store.getPath)
      .select(col("id"), col("likeCount")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after2("26934") == 99L, s"upsert did not win: ${after2("26934")}")
    assert(after2 - "26934" == after1 - "26934",
      "untouched posts changed across the incremental run")
  }

  test("offsets round-trip through their JSON wire form") {
    // the checkpoint log stores offsets as JSON; a serde asymmetry
    // would surface as a poisoned checkpoint on restart. The tie
    // cohort pins the committed set at the watermark, so paths with
    // JSON-hostile characters must survive the trip too.
    import graft.sources.{PageMicroBatchStream, PageOffset}
    val stream = new PageMicroBatchStream(
      Files.createTempDirectory("graft_off").toFile.getPath,
      graft.sources.PageSource.SCHEMA, Array.empty)
    for (o <- Seq(PageOffset(0), PageOffset(1, 1000L, Seq("/a/b.json")),
        PageOffset(7, 99L, Seq("/odd \"quoted\" name.json", "/a,b.json")),
        PageOffset(123456, 5L, Seq("C:\\win\\style.json"))))
      assert(stream.deserializeOffset(o.json()) == o)
    intercept[IllegalArgumentException](stream.deserializeOffset("{}"))
  }

  test("an equal-mtime late arrival is benign, not a poisoned checkpoint") {
    // coarse-granularity filesystems can land two fetches in the same
    // (m)second; a late arrival whose mtime EQUALS the committed
    // watermark but sorts lexicographically earlier must simply appear
    // in the next batch — under index-based offsets it would shift the
    // committed prefix and fail every restart forever
    val dir = fetchDir()
    val ckpt = Files.createTempDirectory("graft_pages_tie").toFile
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def drainOnce(): Int = {
      val before = out.size
      val q = spark.readStream.format("graft-pages").load(dir.getPath)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.getPath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = batch.select(col("path")).collect().map(_.getString(0))
          out.synchronized { out ++= got }
          ()
        }.start()
      q.awaitTermination()
      out.size - before
    }
    assert(drainOnce() == 2) // watermark now 2000000 (page_data.json)
    // same mtime as the committed watermark, lexicographically EARLIER
    val tie = new File(dir, "page_aaa_tie.json")
    Files.writeString(tie.toPath, fixture("tagpage_graphql.json"))
    tie.setLastModified(2000000L)
    assert(drainOnce() == 1, "the tie arrival must be planned, not skipped")
    assert(out.last.endsWith("page_aaa_tie.json"))
    assert(drainOnce() == 0, "nothing may be re-emitted after the tie")
  }

  test("a backdated page fails the replay loudly instead of silently skipping") {
    // positional offsets are only sound while the directory is
    // append-only with non-decreasing mtimes; a file landing INSIDE
    // the committed prefix must abort the stream, not corrupt it
    val dir = fetchDir()
    val ckpt = Files.createTempDirectory("graft_pages_bd").toFile
    def drain(): Unit = {
      val q = spark.readStream.format("graft-pages").load(dir.getPath)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.getPath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      q.awaitTermination()
    }
    drain() // commits offset 2 with lastPath = page_graphql/page_data tail
    // a "fetch result" backdated BEFORE the committed pages (cp -p,
    // clock skew) — sorts into the already-committed prefix
    val backdated = new File(dir, "aaa_backdated.json")
    Files.writeString(backdated.toPath, "{}")
    backdated.setLastModified(500L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("no longer append-only"))),
      s"expected the append-only violation message, got: ${e.getMessage}")
  }

  test("micro-batch replay is incremental across checkpointed AvailableNow runs") {
    val dir = fetchDir()
    val ckpt = Files.createTempDirectory("graft_pages_ckpt").toFile
    val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    def drainOnce(): Int = {
      val before = out.size
      val q = spark.readStream.format("graft-pages").load(dir.getPath)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.getPath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = batch.select(col("path"), col("mtime_ms")).collect()
            .map(r => (r.getString(0), r.getLong(1)))
          out.synchronized { out ++= got }
          ()
        }.start()
      q.awaitTermination()
      out.size - before
    }
    // run 1: both existing pages
    assert(drainOnce() == 2)
    // a new fetch lands (later mtime — the append-only fetch contract)
    val c = new File(dir, "page_new.json")
    Files.writeString(c.toPath, fixture("tagpage_graphql.json"))
    c.setLastModified(3000000L)
    // run 2 (same checkpoint): ONLY the new page — the reference's
    // incremental cron semantics
    assert(drainOnce() == 1)
    assert(out.last._1.endsWith("page_new.json"))
    // run 3: nothing new → empty
    assert(drainOnce() == 0)
  }

  test("S1 x S6 integration: connector pages flow through the DOM engine") {
    // the full reference news trace, engine-side: a fetch directory of
    // HTML pages scanned by graft-pages, each payload parsed by the
    // tolerant DOM (messy markup on purpose), extracted fields checked
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_pages_dom").toFile
    dir.deleteOnExit()
    Files.writeString(new File(dir, "home_1.html").toPath,
      """<div class='news--box'><button data-url=/n/1
        | data-title="One &amp; Only" data-image=/static/1.jpg>go</button></div>"""
        .stripMargin)
    Files.writeString(new File(dir, "home_2.html").toPath,
      """<div data-x=9 class="news--box featured"><button
        | data-image="https://cdn.x/2.jpg" data-title='Two' data-url="/n/2">go
        |</button></div>""".stripMargin)
    val pages = spark.read.format("graft-pages").load(dir.getPath)
    val rows = pages
      .select(col("path"),
        org.apache.spark.sql.functions.element_at(
          graft.operators.Scalars.domSelectAttrs(
            col("payload"), ".news--box button", "data-title"), 1)
          .as("title"),
        org.apache.spark.sql.functions.element_at(
          graft.operators.Scalars.domSelectAttrs(
            col("payload"), ".news--box button", "data-url"), 1).as("url"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(rows == Set("One & Only" -> "/n/1", "Two" -> "/n/2"))
  }
}
