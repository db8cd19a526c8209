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
  *   - `MicroBatchStream`: offsets index the (mtime, path)-sorted file
  *     list, so `Trigger.AvailableNow` over a checkpoint replays ONLY
  *     files that appeared since the last run — the reference's
  *     incremental cron semantics (each 3-hourly run processes the
  *     newly fetched pages). Append-only is the fetch-loop contract;
  *     PageSourceSpec exercises the incremental restart.
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
          case "payload"  => UTF8String.fromString(new String(
            Files.readAllBytes(new File(page.path).toPath), StandardCharsets.UTF_8))
        })
      override def close(): Unit = ()
    }
  }
}

/** Offsets index into the (mtime, path)-sorted listing: offset N = "the
  * first N pages are committed". New fetch results carry later mtimes,
  * so they extend the suffix — an AvailableNow run against a checkpoint
  * plans exactly the files that appeared since the previous run.
  *
  * The offset also pins the PATH of the last committed page, and
  * [[PageMicroBatchStream.planInputPartitions]] re-checks it against
  * the current listing: positional offsets are only correct while the
  * directory is append-only with non-decreasing mtimes (the fetch-loop
  * contract), and a violation — a file backdated into the committed
  * prefix (cp -p, clock skew) or a deleted page — would otherwise
  * SILENTLY skip one file and re-emit another. With the pin it fails
  * loudly instead. */
case class PageOffset(count: Int, lastPath: String = "") extends Offset {
  override def json(): String = {
    val esc = lastPath.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"count":$count,"lastPath":"$esc"}"""
  }
}

class PageMicroBatchStream(dir: String, required: StructType,
    pushed: Array[Filter]) extends MicroBatchStream {
  private def listing: Seq[PageFile] =
    new PageScan(dir, required, pushed).prunedListing()

  override def initialOffset(): Offset = PageOffset(0)
  override def latestOffset(): Offset = {
    val l = listing
    PageOffset(l.size, l.lastOption.map(_.path).getOrElse(""))
  }
  override def deserializeOffset(json: String): Offset = {
    val count = "\"count\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(s"bad PageOffset: $json"))
    val lastPath = "\"lastPath\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findFirstMatchIn(json)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .getOrElse("")
    PageOffset(count, lastPath)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val l = listing
    val s = start.asInstanceOf[PageOffset]
    val e = end.asInstanceOf[PageOffset]
    def pin(o: PageOffset): Unit =
      if (o.count > 0 && o.lastPath.nonEmpty) {
        require(o.count <= l.size && l(o.count - 1).path == o.lastPath,
          s"graft-pages: the fetch directory is no longer append-only — " +
            s"offset ${o.count} was committed with last page '${o.lastPath}' " +
            s"but the listing now has '${l.lift(o.count - 1).map(_.path).getOrElse("<missing>")}' " +
            "at that position (a page was backdated, renamed or deleted); " +
            "positional replay would silently skip/re-emit pages, refusing instead")
      }
    pin(s); pin(e)
    l.slice(s.count, e.count)
      .map(p => PagePartition(p): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
