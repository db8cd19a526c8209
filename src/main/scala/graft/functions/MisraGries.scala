package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (`graft_mg_topk`) — the frequent-
  * items counterpart of the HLL++/GK sketches in graft.operators
  * .Sketches, as a native TypedImperativeAggregate (the same Catalyst
  * tier Spark's own sketches use; SURVEY.md §2.10).
  *
  * The summary holds at most k (item, count) counters. Updates insert
  * or increment; when the buffer exceeds 2k, the (k+1)-th largest
  * count is subtracted from every counter and non-positives drop
  * (the batched form of MG's decrement — each prune removes ≥ (k+1)·δ
  * of stream mass, so the per-item underestimate over a stream of
  * total mass N is ≤ N/(k+1)). Merging adds counters pointwise and
  * prunes the same way, which preserves the bound under ARBITRARY
  * merge trees — Misra–Gries summaries are mergeable summaries
  * (Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable summaries",
  * PODS'12): exactly the property a map-side-partial aggregate needs,
  * and why the sketch (k counters), never the stream, crosses the
  * shuffle.
  *
  * Guarantees (any merge order, any partitioning):
  *   - est(x) ≤ true(x)  (decrements only, never inflation)
  *   - true(x) − est(x) ≤ N/(k+1)
  *   - every x with true(x) > N/(k+1) is present in the summary
  * The SURVIVING COUNTER SET below the guarantee line is merge-order-
  * dependent, so queries must gate on the guarantees (constant-true
  * booleans), never on raw sketch rows — the q_sketch_* convention.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"graft_mg_topk: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mg_topk expects a string item column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_topk"
  override def children: Seq[Expression] = child :: Nil

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def prune(buf: mutable.HashMap[String, Long]): Unit =
    MisraGries.pruneInPlace(buf, k)

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String].toString
      buf.update(w, buf.getOrElse(w, 0L) + 1L)
      // amortized prune: let the buffer run to 2k, then one O(k·log k)
      // prune removes ≥ k entries — O(log k) amortized per insert
      if (buf.size > 2 * k) prune(buf)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (w, c) => b1.update(w, b1.getOrElse(w, 0L) + c) }
    prune(b1)
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic output order (est desc, item) — cosmetic only; the
    // guarantee-gated queries join by item and never depend on order
    val rows = buf.toArray.sortBy { case (w, c) => (-c, w) }
      .map { case (w, c) =>
        InternalRow(UTF8String.fromString(w), c)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGries {
  import org.apache.spark.sql.graftshim.GraftShim

  /** Aggregate Column: Misra–Gries top-k summary of a string column —
    * array<struct<item,est>> of at most k counters (use with agg()). */
  def mgTopK(c: Column, k: Int): Column =
    GraftShim.column(
      MisraGriesAgg(GraftShim.expression(c), k).toAggregateExpression())

  /** Subtract the (k+1)-th largest count from every counter and drop
    * non-positives — afterwards at most k counters remain (everything
    * ≤ the threshold hits zero). */
  private[graft] def pruneInPlace(
      buf: mutable.HashMap[String, Long], k: Int): Unit =
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val thr = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace { (_, v) => v - thr }
      buf.foreach { case (w, v) => if (v <= 0) dead += w }
      dead.foreach(buf.remove)
    }

  /** Merge two k-counter summaries into one — the mergeable-summaries
    * merge the aggregate uses internally, exposed for DRIVER-side state
    * maintenance (a streaming sink folding one constant-sized summary
    * per micro-batch into persistent sketch state; summaries are k
    * rows, so driver work is O(k log k) per trigger regardless of
    * stream size). Output deterministically ordered (est desc, item). */
  def mergeSummaries(a: Seq[(String, Long)], b: Seq[(String, Long)],
      k: Int): Seq[(String, Long)] = {
    val buf = mutable.HashMap.empty[String, Long]
    (a.iterator ++ b.iterator).foreach { case (w, c) =>
      buf.update(w, buf.getOrElse(w, 0L) + c)
    }
    pruneInPlace(buf, k)
    buf.toSeq.sortBy { case (w, c) => (-c, w) }
  }
}
