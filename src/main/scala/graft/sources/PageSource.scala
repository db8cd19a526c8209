package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 — the reference's page-fetch boundary as a REAL DataSourceV2
  * connector (`.format("graft-pages")`), batch AND micro-batch.
  *
  * The reference's ingestion edge is a cron-driven headless-browser
  * fetch loop (main.js:35-39 cadence; posts-from-hashtags.js:294-352
  * serial page walk) that yields one raw page payload per fetch. The
  * sandbox has no network, so the connector models exactly the part of
  * that boundary an engine owns: a DIRECTORY OF FETCHED PAGE PAYLOADS
  * (append-only — each new file is one fetch result), surfaced as rows
  * `(path, mtime_ms, length, payload)` that downstream operators parse
  * with `Ingest.parseTagPage`/`postsFromParsed` exactly like the
  * driver-scheduled replay in StreamingGate.
  *
  * Spark-surface demonstrated (SURVEY §2.10's connector tier):
  *   - `TableProvider` + `DataSourceRegister` (short name) + schema
  *     inference
  *   - batch reads with one `InputPartition` per page file — at scale
  *     the fetch results land on a shared store and partitions spread
  *     across executors; nothing funnels through the driver but the
  *     file LISTING (names + sizes, not payloads)
  *   - COLUMN PRUNING pushed into the reader
  *     (`SupportsPushDownRequiredColumns`): a metadata-only query
  *     (`path`/`length`) never opens a single payload file
  *   - FILE PRUNING pushed from `path` filters
  *     (`SupportsPushDownFilters`, EqualTo/StringStartsWith): the
  *     partition-pruning analog — pruned pages are never planned, so
  *     a "this hashtag only" query reads 1/N of the directory
  *   - `MicroBatchStream`: offsets pin the committed set by an mtime
  *     watermark + same-mtime tie cohort (see [[PageOffset]]), so
  *     `Trigger.AvailableNow` over a checkpoint replays ONLY files
  *     that appeared since the last run — the reference's incremental
  *     cron semantics (each 3-hourly run processes the newly fetched
  *     pages). Append-only is the fetch-loop contract; PageSourceSpec
  *     exercises the incremental restart, an equal-mtime late arrival
  *     (benign), and a backdated file (loud refusal).
  *
  * Payloads are read as UTF-8 text (the reference's pages are
  * HTML/JSON); a binary variant would only change the column type.
  */
class PageSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PageSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PageTable(properties.get("path"))
}

object PageSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("mtime_ms", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  /** Deterministic page listing: (mtime, path)-sorted — the replay
    * order, and the order micro-batch offsets index into. Driver-side
    * names-and-sizes only. */
  def listPages(dir: String): Seq[PageFile] = {
    val base = new File(dir)
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(f => PageFile(f.getAbsolutePath, f.lastModified(), f.length()))
      .sortBy(p => (p.mtimeMs, p.path)).toSeq
  }

  /** Test hook: counts payload-file opens. In local mode executors
    * share the driver JVM, so specs can assert END-TO-END that a
    * column-pruned query never opens a payload file (a permission
    * probe can't — tests run as root, which reads through mode bits). */
  private[graft] val payloadOpens = new java.util.concurrent.atomic.AtomicLong
}

case class PageFile(path: String, mtimeMs: Long, length: Long)

class PageTable(dir: String) extends Table with SupportsRead {
  require(dir != null, "graft-pages requires .load(<directory>)")
  override def name(): String = s"graft-pages:$dir"
  override def schema(): StructType = PageSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PageScanBuilder(dir)
}

class PageScanBuilder(dir: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = PageSource.SCHEMA
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order; an empty projection (count(*)) keeps
    // a zero-field schema — readers then emit empty rows without I/O
    required = StructType(PageSource.SCHEMA.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  /** `path` predicates prune the FILE LISTING itself (accepted and
    * consumed here); everything else stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, reject) = filters.partition {
      case EqualTo("path", _: String)          => true
      case StringStartsWith("path", _: String) => true
      case _                                   => false
    }
    pushed = accept
    reject // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new PageScan(dir, required, pushed)
}

class PageScan(dir: String, required: StructType, pushed: Array[Filter])
    extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-pages dir=$dir, PrunedColumns=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters=${pushed.mkString("[", ", ", "]")}"

  private[sources] def prunedListing(): Seq[PageFile] =
    PageSource.listPages(dir).filter(p => pushed.forall {
      case EqualTo("path", v: String)          => p.path == v
      case StringStartsWith("path", v: String) => p.path.startsWith(v)
      case _                                   => true
    })

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      prunedListing().map(p => PagePartition(p): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new PageReaderFactory(required)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PageMicroBatchStream(dir, required, pushed)
}

case class PagePartition(page: PageFile) extends InputPartition

/** One row per page file; the payload file is opened ONLY if the pruned
  * schema still contains `payload`. */
class PageReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[PagePartition].page
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = if (consumed) false else { consumed = true; true }
      override def get(): InternalRow =
        InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "path"     => UTF8String.fromString(page.path)
          case "mtime_ms" => page.mtimeMs
          case "length"   => page.length
          case "payload"  =>
            PageSource.payloadOpens.incrementAndGet()
            UTF8String.fromString(new String(
              Files.readAllBytes(new File(page.path).toPath), StandardCharsets.UTF_8))
        })
      override def close(): Unit = ()
    }
  }
}

/** Offsets pin the committed set by an MTIME WATERMARK plus the paths
  * committed AT that watermark (the same-mtime "tie cohort"):
  * committed = every page with mtime < lastMtime, plus the tiePaths at
  * mtime == lastMtime. New fetch results carry mtimes >= the
  * watermark, so an AvailableNow run against a checkpoint plans
  * exactly the pages that appeared since the previous run.
  *
  * This representation is deliberately NOT positional: on a
  * coarse-granularity filesystem two fetches can land in the same
  * second, and a late arrival whose mtime EQUALS the watermark but
  * sorts lexicographically earlier would shift every index-based
  * prefix — poisoning the checkpoint forever even though the directory
  * honored "append-only, non-decreasing mtimes". Here such a tie
  * insertion is benign: the newcomer is simply not in the tie cohort,
  * so the next batch picks it up, nothing is skipped or re-emitted.
  * What still fails LOUDLY (checked in
  * [[PageMicroBatchStream.planInputPartitions]]): a file backdated
  * strictly below the watermark (cp -p, clock skew) or a committed
  * page deleted/renamed — either desynchronizes the committed set and
  * silent replay would skip or duplicate pages.
  *
  * Offset size is bounded by the largest same-mtime cohort (a handful
  * of files even at 1 s granularity), never the full history. */
case class PageOffset(count: Int, lastMtime: Long = -1L,
    tiePaths: Seq[String] = Nil) extends Offset {
  override def json(): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val ties = tiePaths.map(p => "\"" + esc(p) + "\"").mkString(",")
    s"""{"count":$count,"lastMtime":$lastMtime,"tiePaths":[$ties]}"""
  }

  /** The committed subset of a listing under this offset. */
  def committed(l: Seq[PageFile]): Seq[PageFile] = {
    val ties = tiePaths.toSet
    l.filter(f => f.mtimeMs < lastMtime ||
      (f.mtimeMs == lastMtime && ties.contains(f.path)))
  }
}

class PageMicroBatchStream(dir: String, required: StructType,
    pushed: Array[Filter]) extends MicroBatchStream {
  private def listing: Seq[PageFile] =
    new PageScan(dir, required, pushed).prunedListing()

  override def initialOffset(): Offset = PageOffset(0)
  override def latestOffset(): Offset = {
    val l = listing
    if (l.isEmpty) PageOffset(0)
    else {
      val lastM = l.last.mtimeMs // (mtime, path)-sorted => max mtime
      PageOffset(l.size, lastM, l.filter(_.mtimeMs == lastM).map(_.path))
    }
  }
  override def deserializeOffset(json: String): Offset = {
    val count = "\"count\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(s"bad PageOffset: $json"))
    val lastMtime = "\"lastMtime\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(-1L)
    val ties = "\"tiePaths\"\\s*:\\s*\\[((?:[^\\]\\\\]|\\\\.)*)\\]".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val tiePaths = "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(ties)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    PageOffset(count, lastMtime, tiePaths)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val l = listing
    val s = start.asInstanceOf[PageOffset]
    val e = end.asInstanceOf[PageOffset]
    def pin(o: PageOffset): Seq[PageFile] = {
      val c = o.committed(l)
      if (o.count > 0) {
        val tiesPresent = o.tiePaths.forall(p =>
          l.exists(f => f.path == p && f.mtimeMs == o.lastMtime))
        require(c.size == o.count && tiesPresent,
          s"graft-pages: the fetch directory is no longer append-only — " +
            s"offset committed ${o.count} pages up to mtime ${o.lastMtime} " +
            s"but the listing now yields ${c.size} committed pages" +
            (if (tiesPresent) "" else " (a committed page at the watermark was renamed or deleted)") +
            "; a page was backdated below the watermark, renamed or " +
            "deleted — silent replay would skip or re-emit pages, refusing instead")
      }
      c
    }
    val startSet = pin(s).map(_.path).toSet
    pin(e).filterNot(f => startSet.contains(f.path))
      .map(p => PagePartition(p): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
