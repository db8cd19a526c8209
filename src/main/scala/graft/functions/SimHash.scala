package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash (`graft_simhash`) as a codegen expression.
  *
  * Bit i of the fingerprint is the sign of the token-weighted sum of
  * the top bit of hex digit i of md5(token) — EXACTLY the semantics of
  * the SQL formulation in q_dedup_simhash's oracle (and of the nested
  * `aggregate`/`transform` HOF expression it replaces). The HOF form
  * recomputes md5(token) 32 times per token through interpreted lambda
  * plumbing; this kernel digests each token ONCE and folds all 32
  * counters in a single pass — same output string, ~1/32 the hashing.
  */
object SimHashKernel {
  // per-thread digest: getInstance per ROW pays a JCA provider lookup
  // and digest allocation; digest() self-resets, so reuse is safe (the
  // same pattern Spark's own Md5 codegen uses)
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhash(s: UTF8String): UTF8String = {
    if (s == null) return null
    val md = mdLocal.get()
    val acc = new Array[Int](32)
    // same tokenization as the SQL form: split(lower(text), ' ') keeping
    // empty tokens (consecutive spaces hash the empty string too).
    // Locale.ROOT: Spark's lower() is locale-independent; the default
    // toLowerCase would diverge on tr/az/lt-locale executors ('I'→'ı')
    val toks = s.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val d = md.digest(toks(t).getBytes("UTF-8"))
      var i = 0
      while (i < 16) {
        acc(2 * i) += (if (((d(i) >> 4) & 0xf) >= 8) 1 else -1)
        acc(2 * i + 1) += (if ((d(i) & 0xf) >= 8) 1 else -1)
        i += 1
      }
      t += 1
    }
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 32) { sb.append(if (acc(i) >= 0) '1' else '0'); i += 1 }
    UTF8String.fromString(sb.toString)
  }
}

case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(v: Any): Any =
    SimHashKernel.simhash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHashExpression {
  import org.apache.spark.sql.graftshim.GraftShim

  def simhash(c: Column): Column =
    GraftShim.column(SimHash(GraftShim.expression(c)))
}
