package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003 — the MOSS algorithm). The rolling-hash fingerprinting op of
  * training-data pipelines: robust to insertions/reorderings where a
  * whole-document hash (q_fingerprint) is not.
  *
  *   1. rolling Rabin-Karp hash over every K-byte gram (O(n), one
  *      multiply+add per byte — NOT the O(n·K) per-gram recompute),
  *   2. minimum hash of each W-consecutive-gram window,
  *   3. distinct minima, sorted — the document's fingerprint set.
  *
  * Documents sharing any fingerprint share a K-gram region → candidate
  * near-dups. Constants: K=8, W=4, base 31, modulus 2^20 (keeps every
  * intermediate exactly representable in both Long and the oracle's
  * BIGINT sums, so Spark and DuckDB agree bit-for-bit).
  */
object WinnowKernel {
  val K = 8
  val W = 4
  val B = 31L
  val M = 1L << 20

  /** B^(K-1) mod M, the outgoing-byte weight of the rolling hash. */
  val BK: Long = {
    var r = 1L; var i = 0
    while (i < K - 1) { r = r * B % M; i += 1 }
    r
  }

  /** Sorted distinct window-min fingerprints; empty when the text has
    * fewer than K+W-1 bytes (no full window of K-grams). */
  def winnow(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val nh = n - K + 1
    if (nh < W) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](nh)
    var acc = 0L
    var j = 0
    while (j < K) { acc = (acc * B + (bytes(j) & 0xffL)) % M; j += 1 }
    h(0) = acc
    var i = 1
    while (i < nh) {
      val out = (bytes(i - 1) & 0xffL) * BK % M
      acc = ((acc - out + M) * B + (bytes(i + K - 1) & 0xffL)) % M
      h(i) = acc
      i += 1
    }
    val fps = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= nh - W) {
      var m = h(i)
      var k = 1
      while (k < W) { if (h(i + k) < m) m = h(i + k); k += 1 }
      fps.add(m)
      i += 1
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_winnow(text)` → array<bigint> of winnowed fingerprints, as a
  * native expression: the rolling hash runs inside whole-stage codegen
  * via a static kernel call, exactly like [[Stem]]. */
case class Winnow(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(v: Any): Any =
    WinnowKernel.winnow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowKernel.winnow($c)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object WinnowExpression {
  import org.apache.spark.sql.graftshim.GraftShim

  def winnow(c: Column): Column =
    GraftShim.column(Winnow(GraftShim.expression(c)))
}
