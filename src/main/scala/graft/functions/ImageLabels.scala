package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_image_labels(content)` — the M1 image→labels operator with a
  * REAL image decode (reference: labels.js:51-71 maps a Rekognition
  * DetectLabels response to `[{confidence, name}]`; models.js:36-39 is
  * the stored shape). A custom Generator (UDTF): one label ROW per
  * detected label per image, wrapped by the analyzer in a Generate
  * node exactly like `explode`, so it composes with any projection and
  * parallelizes as a narrow map — image bytes never cross a shuffle.
  *
  * The decode is `javax.imageio` (JDK-bundled, fully offline): the PNG
  * or JPEG payload is actually parsed, and the "label model" ranks the
  * decoded color channels by total luminance-contribution — label name
  * = channel (`red`/`green`/`blue`), rank by per-channel pixel sum
  * descending (channel order breaks ties), confidence = the channel's
  * mean intensity as a percentage (`100·sum/(255·n_px)`). Deterministic
  * given the pixels, so a closed-form oracle can restate it exactly
  * over generated fixtures. A vision-model deployment swaps only the
  * ranking body; the decode and the Generate plumbing stay.
  *
  * An undecodable payload (null, empty, not an image) detects nothing:
  * zero rows, like a Rekognition call that found no labels — never an
  * executor-killing throw on one corrupt image in a 100 TB scan.
  */
case class ImageLabels(child: Expression) extends UnaryExpression
    with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_image_labels expects a binary argument, got ${other.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("label_rank", LongType, nullable = false),
    StructField("confidence", DoubleType, nullable = false),
    StructField("name", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil else ImageLabels.detect(v.asInstanceOf[Array[Byte]])
  }

  override protected def withNewChildInternal(newChild: Expression): ImageLabels =
    copy(child = newChild)
}

object ImageLabels {
  // never spill decode scratch to a temp file on the executor's disk
  javax.imageio.ImageIO.setUseCache(false)

  private val CHANNELS = Array("red", "green", "blue")

  private[graft] def detect(bytes: Array[Byte]): Seq[InternalRow] = {
    if (bytes == null || bytes.isEmpty) return Nil
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return Nil
    val w = img.getWidth
    val h = img.getHeight
    if (w == 0 || h == 0) return Nil
    val sums = new Array[Long](3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sums(0) += (p >> 16) & 0xff
        sums(1) += (p >> 8) & 0xff
        sums(2) += p & 0xff
        x += 1
      }
      y += 1
    }
    val nPx = w.toLong * h
    CHANNELS.indices.sortBy(i => (-sums(i), i)).zipWithIndex.map {
      case (ch, rank) =>
        InternalRow(rank + 1L, 100.0 * sums(ch) / (255.0 * nPx),
          UTF8String.fromString(CHANNELS(ch)))
    }
  }

  /** Column API, used exactly like `explode(...)` in a select. */
  def labels(c: Column): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      ImageLabels(org.apache.spark.sql.graftshim.GraftShim.expression(c)))
}
