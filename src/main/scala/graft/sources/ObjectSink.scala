package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** K4/M2 — the reference's object-store put as a DataSourceV2 WRITE
  * path (`.format("graft-objects")`).
  *
  * The reference uploads each fetched image to S3 under a key derived
  * from the post (storeImages/main.js side; declared offline in
  * SURVEY §2). This sink models exactly the engine-owned part: rows
  * `(key, payload)` become one object per row under the target
  * directory, through the REAL cloud-store commit protocol —
  *
  *   - each task writes to a private staging dir
  *     `.staging-<queryId>/<partition>-<taskId>/` (speculative or
  *     retried tasks get DISTINCT dirs and cannot clobber each other),
  *   - the task's commit message lists its staged files,
  *   - the DRIVER finalizes the job by moving only the WINNING tasks'
  *     files to their final keys (job commit), or deletes all staging
  *     on abort — so a failed job leaves no partial objects visible.
  *
  * `mode("overwrite")` maps to `SupportsTruncate`: existing objects are
  * removed inside the two-phase job commit, only after every new
  * object is already parked in the destination under hidden names —
  * see [[ObjectBatchWrite]] for the failure-window analysis. At 100 TB
  * this is the layout a 1000-executor job uses against an object
  * store: writers never coordinate with each other, the driver's
  * commit is O(files) renames (metadata-only on a real store), and
  * nothing buffers on the driver.
  */
class ObjectSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-objects"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ObjectSink.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ObjectTable(properties.get("path"))
}

object ObjectSink {
  val SCHEMA: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  private[sources] def stagingRoot(dir: String, queryId: String) =
    new File(dir, s".staging-$queryId")

  private[sources] def deleteRec(f: File): Unit = graft.Fs.deleteRec(f)

  /** Visible (committed) objects = non-hidden files in the directory. */
  def listObjects(dir: String): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName).toSeq

  /** Debris from OTHER jobs' crashed commits is only reaped once it is
    * provably dead — older than any plausible live commit window. A
    * concurrent append job's freshly parked phase-1 files must never be
    * deleted out from under it (they look identical to crash debris
    * while that job is mid-commit). */
  private[graft] val FOREIGN_DEBRIS_MIN_AGE_MS: Long = 60L * 60 * 1000
}

class ObjectTable(dir: String) extends Table with SupportsWrite {
  require(dir != null, "graft-objects requires .save(<directory>)")
  override def name(): String = s"graft-objects:$dir"
  override def schema(): StructType = ObjectSink.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ObjectWriteBuilder(dir, info)
}

class ObjectWriteBuilder(dir: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = {
    val fields = info.schema().fieldNames.toSeq
    require(fields == Seq("key", "payload"),
      s"graft-objects expects columns (key, payload), got ${fields.mkString(",")}")
    new Write {
      override def toBatch: BatchWrite =
        new ObjectBatchWrite(dir, info.queryId(), truncateFirst)
    }
  }
}

/** Driver-side job coordinator: commit = finalize winners, abort =
  * drop staging. Serializable closure state is just (dir, queryId).
  *
  * Commit is TWO-PHASE to keep the no-partial-visibility contract even
  * when the commit itself fails mid-way: (1) every staged file is
  * first moved into the destination under a hidden `.commit-` name —
  * any failure here (disk full, vanished staging) aborts with the OLD
  * objects fully intact and nothing new visible; (2) only once every
  * move succeeded are old objects truncated (overwrite mode) and the
  * hidden names flipped to their final keys — a window of pure
  * metadata renames, the same shrink-the-critical-section shape as a
  * real object store's multipart complete.
  *
  * Phase 2 is guarded by an INTENT MARKER (`.commit-<queryId>-PHASE2`,
  * written after every park succeeded, removed after every flip
  * succeeded): if the job dies inside phase 2 — old objects possibly
  * already truncated, the parked files the ONLY copy of the new data —
  * [[abort]] sees the marker and rolls FORWARD (completes the
  * remaining flips) instead of deleting the payloads. Without the
  * marker, abort knows old data is still intact and rolls BACK
  * (discards the parked files). Leftover `.commit-*` debris is reaped
  * only when provably dead: this job's own queryId, or foreign files
  * older than [[ObjectSink.FOREIGN_DEBRIS_MIN_AGE_MS]] — a concurrent
  * job's live phase-1 files are never touched. */
class ObjectBatchWrite(dir: String, queryId: String, truncateFirst: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ObjectWriterFactory(dir, queryId)

  private def phase2Marker = new File(dir, s".commit-$queryId-PHASE2")

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val base = new File(dir)
    base.mkdirs()
    // reap hidden debris that is provably dead: our OWN queryId (a
    // retried commit of this very job), or foreign files old enough
    // that no live job can still own them. A CONCURRENT job's fresh
    // phase-1 parks are left alone — deleting them mid-commit would
    // manufacture exactly the partial-visibility state this sink
    // rules out.
    val now = System.currentTimeMillis()
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith(".commit-"))
      .filter(f => f.getName.startsWith(s".commit-$queryId-") ||
        now - f.lastModified() > ObjectSink.FOREIGN_DEBRIS_MIN_AGE_MS)
      .foreach(_.delete())
    // later tasks win over earlier ones on a same-key collision across
    // partitions — deterministic (messages are partition-ordered)
    val staged = messages.flatMap { case ObjectCommitMsg(s) => s }
    // phase 1: park everything in the destination under hidden names;
    // a failure here leaves old data untouched and nothing new visible
    val parked = staged.zipWithIndex.map { case ((tmp, finalName), i) =>
      val hidden = new File(base, s".commit-$queryId-$i")
      Files.move(new File(tmp).toPath, hidden.toPath,
        StandardCopyOption.REPLACE_EXISTING)
      (hidden, finalName)
    }
    // intent marker: from here on the parked files may be the only copy
    // of the new data (truncate comes next), so abort() must roll
    // FORWARD past this point, never delete them
    Files.write(phase2Marker.toPath,
      parked.map { case (h, f) => s"${h.getName}\t$f" }.mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    // phase 2: truncate (overwrite mode) + flip hidden -> final keys —
    // metadata renames only
    if (truncateFirst) ObjectSink.listObjects(dir).foreach(_.delete())
    parked.foreach { case (hidden, finalName) =>
      Files.move(hidden.toPath, new File(base, finalName).toPath,
        StandardCopyOption.REPLACE_EXISTING)
    }
    phase2Marker.delete()
    ObjectSink.deleteRec(ObjectSink.stagingRoot(dir, queryId))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    ObjectSink.deleteRec(ObjectSink.stagingRoot(dir, queryId))
    val base = new File(dir)
    if (phase2Marker.exists()) {
      // phase 2 had begun: old objects may already be truncated and the
      // parked files are the only copy — complete the remaining flips
      // instead of deleting them (roll forward). A flip that fails
      // again leaves its parked payload in place for recovery.
      val pairs = new String(Files.readAllBytes(phase2Marker.toPath),
        StandardCharsets.UTF_8).split("\n").toSeq
        .filter(_.contains("\t")).map { line =>
          val i = line.indexOf('\t'); (line.substring(0, i), line.substring(i + 1))
        }
      val allFlipped = pairs.forall { case (hiddenName, finalName) =>
        val hidden = new File(base, hiddenName)
        !hidden.exists() || scala.util.Try(Files.move(hidden.toPath,
          new File(base, finalName).toPath,
          StandardCopyOption.REPLACE_EXISTING)).isSuccess
      }
      if (allFlipped) phase2Marker.delete()
    } else {
      // phase 1 (or earlier) failure: old objects are fully intact —
      // roll back by discarding this job's parked files
      Option(base.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.startsWith(s".commit-$queryId"))
        .foreach(_.delete())
    }
  }
}

class ObjectWriterFactory(dir: String, queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ObjectWriter(dir, queryId, partitionId, taskId)
}

case class ObjectCommitMsg(staged: Seq[(String, String)]) extends WriterCommitMessage

/** Executor-side writer: stages one file per row; nothing becomes
  * visible until the driver's job commit. Keys are flattened to safe
  * file names by a COLLISION-FREE percent-encoding (an object store's
  * key separator is cosmetic, but "a/b" and a literal "a__b" must not
  * land on the same object — and '%' itself is escaped so the map is
  * injective). A leading '.' or '_' is percent-encoded too: those
  * names are the sink's own hidden namespace, and an unencoded
  * "_meta" would be written successfully yet be invisible to
  * [[ObjectSink.listObjects]] forever — a silent put that can never
  * be read back or truncated. (Injectivity holds: step-1 escapes '%',
  * so no step-1 output can begin with the literal "%2E"/"%5F" the
  * step-2 encoding produces.) A key written twice in one task keeps the LAST payload
  * and stages ONE file — put semantics, and the job commit never sees
  * two moves of the same source. */
class ObjectWriter(dir: String, queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val taskDir = {
    val d = new File(ObjectSink.stagingRoot(dir, queryId), s"$partitionId-$taskId")
    d.mkdirs(); d
  }
  // insertion-ordered, keyed by final name: re-writing a key replaces
  // its payload in place instead of staging a duplicate entry
  private val staged =
    scala.collection.mutable.LinkedHashMap[String, String]()

  override def write(row: InternalRow): Unit = {
    val key = row.getUTF8String(0).toString
    require(key.nonEmpty, "graft-objects: empty key")
    val escaped = key.replace("%", "%25").replace("/", "%2F")
      .replace("\\", "%5C")
    val finalName =
      if (escaped.startsWith(".")) "%2E" + escaped.substring(1)
      else if (escaped.startsWith("_")) "%5F" + escaped.substring(1)
      else escaped
    val payload = if (row.isNullAt(1)) "" else row.getUTF8String(1).toString
    val tmp = new File(taskDir, finalName)
    Files.write(tmp.toPath, payload.getBytes(StandardCharsets.UTF_8))
    staged.put(finalName, tmp.getAbsolutePath)
  }
  override def commit(): WriterCommitMessage =
    ObjectCommitMsg(staged.toSeq.map { case (name, tmp) => (tmp, name) })
  override def abort(): Unit = ObjectSink.deleteRec(taskDir)
  override def close(): Unit = ()
}
