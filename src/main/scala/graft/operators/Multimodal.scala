package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column operators (reference: image→Rekognition labels,
  * module/instagram/labels.js:51-80 = SURVEY.md M1/M2; generalized to the
  * opaque-binary-column pattern of training-data pipelines).
  *
  * Media is carried as an opaque `binary` column plus typed metadata.
  * Decode / feature-extraction runs executor-side via `mapPartitions`
  * over a typed Dataset in fixed-size batches — the exact plumbing a real
  * decoder (image lib / model runtime) plugs into. The decode kernel
  * itself is a STUB: the container has no image/audio libraries, so
  * `decodeStub` computes deterministic fake features from the bytes
  * (documented below) instead of a real JPEG parse. The schema,
  * batching, partitioning and typed I/O are real and oracle-checked.
  *
  * Scale notes: binary payloads never pass through a shuffle here — the
  * decode is a narrow map; only the small feature rows move on. Batch
  * size 64 bounds per-task peak memory regardless of partition size.
  */
object Multimodal extends graft.QueryPack {

  case class MediaRow(doc_id: Long, content: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, magic: String,
      fake_width: Long, fake_height: Long, frame_sum: Long)

  /** STUB decoder — stands in for image decode / feature extraction.
    * Deterministic fake: "header" fields from leading byte values and a
    * every-16th-byte "frame sample" checksum. A real deployment replaces
    * only this function; the Spark plumbing around it is unchanged.
    * A NULL payload decodes as empty bytes (real media columns have
    * null rows routinely; an NPE here fails the whole job) — same
    * null-tolerance as the sibling LabelGen kernel. */
  def decodeStub(m: MediaRow): MediaFeatures = {
    val b = if (m.content == null) Array.emptyByteArray else m.content
    def at(i: Int): Long = if (i < b.length) b(i) & 0xffL else 0L
    val frameSum = b.indices.by(16).map(i => b(i) & 0xffL).sum
    MediaFeatures(
      doc_id = m.doc_id,
      n_bytes = b.length.toLong,
      magic = new String(b.take(2), "UTF-8"),
      fake_width = at(0) * 256 + at(1),
      fake_height = at(2) * 256 + at(3),
      frame_sum = frameSum)
  }

  /** Executor-side batched decode: partitions stream through in batches
    * of 64 rows (the batch shape a vectorized decoder / model server
    * call would use). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(64).flatMap(_.map(decodeStub)))
      .toDF()
  }

  case class FrameRow(
      doc_id: Long, frame_no: Long, frame_offset: Long,
      frame_checksum: Long, n_frames: Long,
      resized_len: Long, resized_md5: String)

  /** STUB transform — stands in for image resize + video frame
    * sampling. "Resize" = every-4th-byte stride (output identified by
    * md5, the real op emits a smaller binary); "frames" = 256-byte
    * blocks, sampled at first / middle / last; per-frame checksum =
    * byte sum. Deterministic, so the oracle restates it byte-for-byte
    * on the ASCII payloads. A real decoder replaces only this body.
    * NULL payload = empty bytes, as in [[decodeStub]]. */
  def transformStub(m: MediaRow): Seq[FrameRow] = {
    val b = if (m.content == null) Array.emptyByteArray else m.content
    val resized = b.indices.by(4).map(b(_)).toArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val resizedMd5 = md.digest(resized).map("%02x".format(_)).mkString
    val nFrames = math.max((b.length + 255) / 256, 1)
    Seq(0, nFrames / 2, nFrames - 1).distinct.sorted.map { f =>
      val off = f * 256
      val end = math.min(off + 256, b.length)
      val checksum =
        if (off >= b.length) 0L
        else (off until end).map(i => b(i) & 0xffL).sum
      FrameRow(m.doc_id, f.toLong, off.toLong, checksum, nFrames.toLong,
        resized.length.toLong, resizedMd5)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary media column → typed features via mapPartitions batches.
    "q_multimodal_features" -> ((s, d) => {
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      extractFeatures(s, media)
        .select(col("doc_id"), col("n_bytes"), col("magic"),
          col("fake_width"), col("fake_height"), col("frame_sum"))
        .orderBy(col("doc_id"))
    }),

    // Resize + frame-sample plumbing: the other two media transforms a
    // training pipeline runs (image resize, video frame sampling),
    // through the same batched mapPartitions shape as the decode — one
    // output row per sampled frame, binary never crosses a shuffle,
    // only checksums/digests move on.
    "q_multimodal_transform" -> ((s, d) => {
      import s.implicits._
      Tables(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[MediaRow]
        .mapPartitions(_.grouped(64).flatMap(_.flatMap(transformStub)))
        .toDF()
        .orderBy(col("doc_id"), col("frame_no"))
    }),

    // M1 as a Generator (UDTF): one label row per media item per label,
    // via the custom graft_labels generator — planned as a Generate
    // node exactly like explode (§2.10's "Generator variant to emit one
    // label row per image").
    "q_multimodal_labels" -> ((s, d) => {
      Tables(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .select(col("doc_id"), graft.functions.LabelGen.labels(col("content")))
        .orderBy(col("doc_id"), col("label_rank"))
    })
  )

  /** DuckDB expression for the LabelGen checksum over text-payload
    * expression `p` — ascii sum of every 16th byte; COALESCE because
    * list_sum([]) is NULL in DuckDB while the kernel's checksum over an
    * empty payload is 0 (one label emitted). ONE definition shared by
    * the q_multimodal_labels oracle and the pipeline oracle's label
    * stage. */
  def labelChecksumSqlDuck(p: String): String =
    s"CAST(COALESCE(list_sum(list_transform(range(1, length($p) + 1, 16), " +
      s"i -> ascii(substring($p, i, 1)))), 0) AS BIGINT)"

  // documents.text is ASCII, so byte values == ascii codes and the stub
  // features are exactly expressible in SQL for the oracle.
  def oracles: Map[String, String] = Map(
    "q_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  substring(text, 1, 2) AS magic,
        |  CAST(ascii(substring(text, 1, 1)) * 256 + ascii(substring(text, 2, 1)) AS BIGINT) AS fake_width,
        |  CAST(ascii(substring(text, 3, 1)) * 256 + ascii(substring(text, 4, 1)) AS BIGINT) AS fake_height,
        |  CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1, 16),
        |       i -> ascii(substring(text, i, 1)))), 0) AS BIGINT) AS frame_sum
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_transform" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    greatest((length(text) + 255) // 256, 1) AS n_frames,
        |    array_to_string(list_transform(
        |      range(1, length(text) + 1, 4), i -> substring(text, i, 1)), '')
        |      AS resized
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, text, n_frames, resized,
        |    unnest(list_sort(list_distinct(
        |      [0, n_frames // 2, n_frames - 1]))) AS frame_no
        |  FROM f)
        |SELECT doc_id,
        |  CAST(frame_no AS BIGINT) AS frame_no,
        |  CAST(frame_no * 256 AS BIGINT) AS frame_offset,
        |  CAST(CASE WHEN frame_no * 256 >= length(text) THEN 0
        |    ELSE COALESCE(list_sum(list_transform(
        |      range(CAST(frame_no * 256 + 1 AS INTEGER),
        |            CAST(least(frame_no * 256 + 256, length(text)) + 1 AS INTEGER)),
        |      i -> ascii(substring(text, i, 1)))), 0) END AS BIGINT)
        |    AS frame_checksum,
        |  CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(length(resized) AS BIGINT) AS resized_len,
        |  md5(resized) AS resized_md5
        |FROM fr ORDER BY doc_id, frame_no""".stripMargin,

    "q_multimodal_labels" ->
      s"""WITH f AS (
        |  SELECT doc_id, ${labelChecksumSqlDuck("text")} AS fs
        |  FROM documents),
        |l AS (SELECT doc_id, fs, unnest(range(0, 1 + fs % 3)) AS r FROM f)
        |SELECT doc_id, r + 1 AS label_rank,
        |  CAST(100.0 - 10.0 * r AS DOUBLE) AS confidence,
        |  'label_' || CAST((fs + r) % 7 AS VARCHAR) AS name
        |FROM l ORDER BY doc_id, label_rank""".stripMargin
  )
}
