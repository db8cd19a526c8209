package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise vector-sum aggregate (`graft_vec_sum`) — the custom
  * UDAF tier of the Catalyst ladder (TypedImperativeAggregate, the
  * mechanism Spark's own sketches use): a mutable Array[Long] buffer,
  * partial aggregation on the map side, elementwise merge of partials.
  * The training-pipeline use is centroid computation (mean embedding
  * per group — IVF/k-means training, class prototypes).
  *
  * Values are accumulated as FIXED-POINT integers: each element is
  * rounded half-away-from-zero at 6 decimals and summed as a Long.
  * Integer addition is associative, so the result is EXACTLY
  * order-independent — the property that makes a distributed mean
  * reproducible across partitionings, retries and cluster sizes
  * (double summation is not associative), and lets a DuckDB oracle
  * restate it bit-for-bit. Long overflow headroom: 1e6-scaled unit
  * vectors allow ~9e12 rows per group.
  */
case class VecSumScaled(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  val SCALE = 1000000.0

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_vec_sum"
  override def children: Seq[Expression] = child :: Nil

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  /** round half away from zero at 6 decimals, as DuckDB ROUND does. */
  private def scaled(v: Double): Long = {
    val x = v * SCALE
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // fail loudly on a dimension mismatch: silently truncating a long
      // array or zero-padding a short one (bad ingest, schema drift)
      // would pull the centroid toward zero in the missing dimensions
      // with no error — breaking the exactness contract undetectably
      require(arr.numElements() == dim,
        s"graft_vec_sum: input vector has ${arr.numElements()} elements, expected $dim")
      var i = 0
      while (i < dim) {
        if (!arr.isNullAt(i)) buf(i) += scaled(arr.getDouble(i))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(dim * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumScaled =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumScaled =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumScaled =
    copy(child = newChildren.head)
}

object VecSum {
  import org.apache.spark.sql.graftshim.GraftShim

  /** Aggregate Column: elementwise 1e6-fixed-point sum of an
    * array<double> column (use with groupBy().agg()). */
  def vecSumScaled(c: Column, dim: Int): Column =
    GraftShim.column(
      VecSumScaled(GraftShim.expression(c), dim).toAggregateExpression())
}
