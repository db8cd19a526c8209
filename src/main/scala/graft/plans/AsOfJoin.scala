package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the temporal operator the reference's
  * "latest state at time t" lookups imply and Spark lacks as a first-class
  * batch operator (SURVEY.md §2.4 notes the reference has only equi
  * joins; the as-of generalization is the training-pipeline staple:
  * enrich each fact row with the most recent dimension/state row at or
  * before its timestamp).
  *
  * Semantics (left-outer; unmatched left rows keep nulls):
  *   - backward: the right row with equal key and the greatest
  *     `rightTime <= leftTime` (ties: last in (key, time) sort order);
  *   - forward: the right row with equal key and the smallest
  *     `rightTime >= leftTime` (ties: first in sort order);
  *   - toleranceUs: additionally require |rightTime - leftTime| <= tol.
  *
  * Execution (AsOfJoinExec): both sides hash-clustered on the key and
  * sorted by (key, time) — EnsureRequirements inserts the exchanges and
  * sorts — then a single streaming merge pass per partition:
  * O(|L| + |R|) per partition, O(1) state (one buffered match), no
  * range cross-product, no per-key window buffer. This is the layout
  * that survives 100 TB: one shuffle per side on a key that joins are
  * already clustered by, and the merge never materializes a partition.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false,
    toleranceUs: Option[Long] = None)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical sort-merge as-of join. Children are required to arrive
  * hash-clustered on the join key and sorted by (key, time ascending);
  * the merge is a single forward pass over both sorted streams.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    toleranceUs: Option[Long])
  extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match")
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of join time expressions must be LongType (cast timestamps to epoch micros)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Hash-cluster both sides on the key; EnsureRequirements makes the
  // partitionings compatible (same partition count) exactly as it does
  // for sort-merge joins.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // (key, time) ascending on both sides → the merge below is a single pass.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // As-of preserves the left side's partitioning and row identity.
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val leftOut = left.output
    val rightOut = right.output
    val lKeysB = leftKeys.map(BindReferences.bindReference(_, leftOut))
    val rKeysB = rightKeys.map(BindReferences.bindReference(_, rightOut))
    val lTimeB = BindReferences.bindReference(leftTime, leftOut)
    val rTimeB = BindReferences.bindReference(rightTime, rightOut)
    val outAttrs = output
    val fwd = forward
    val tol = toleranceUs

    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lKeysB)
      val rKeyProj = UnsafeProjection.create(rKeysB)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against the right side AS NULLABLE: unmatched left rows read
      // from an all-null row, and a non-nullable BoundReference would
      // silently return primitive defaults (0) instead of null
      val outProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      val rIter = rIter0.buffered
      // backward state: last right row with key == current left key and
      // time <= the left time (copied: child UnsafeRow buffers are reused)
      var matched: InternalRow = null
      var matchedTime: Long = 0L
      var matchedKey: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val ltRaw = lTimeB.eval(lRow)
        var m: InternalRow = null
        // SQL equi-join semantics: a NULL key component never matches —
        // not even null-to-null (the natural ordering would compare two
        // null keys EQUAL, silently attributing null-key right rows to
        // every null-key left row). Such left rows emit the null-fill
        // without advancing the right cursor; null-key RIGHT rows sort
        // first within the partition and are consumed by the c < 0 arm
        // before any non-null left key is probed.
        if (ltRaw != null && !lKey.anyNull) {
          val lt = ltRaw.asInstanceOf[Long]
          if (fwd) {
            // drop rights before (key, lt); the head is then the first
            // candidate — peeked, not consumed (the same right row can
            // serve later left rows too)
            var scan = true
            while (scan && rIter.hasNext) {
              val rKey = rKeyProj(rIter.head)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) rIter.next()
              else if (c == 0) {
                val rt = rTimeB.eval(rIter.head)
                if (rt == null || rt.asInstanceOf[Long] < lt) rIter.next()
                else scan = false
              } else scan = false
            }
            if (rIter.hasNext && keyOrd.compare(rKeyProj(rIter.head), lKey) == 0) {
              val rt = rTimeB.eval(rIter.head).asInstanceOf[Long]
              if (tol.forall(rt - lt <= _)) m = rIter.head
            }
          } else {
            if (matchedKey != null && keyOrd.compare(matchedKey, lKey) != 0) {
              matched = null; matchedKey = null
            }
            var scan = true
            while (scan && rIter.hasNext) {
              val rKey = rKeyProj(rIter.head)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) rIter.next() // right key before any remaining left key
              else if (c == 0) {
                val rt = rTimeB.eval(rIter.head)
                if (rt != null && rt.asInstanceOf[Long] <= lt) {
                  matchedTime = rt.asInstanceOf[Long]
                  matched = rIter.next().copy()
                  if (matchedKey == null) matchedKey = lKey.copy()
                } else if (rt == null) rIter.next() // null right time: unmatched
                else scan = false // beyond this left row; keep for later lefts
              } else scan = false // right key beyond current left key
            }
            if (matched != null && tol.forall(lt - matchedTime <= _)) m = matched
          }
        }
        outProj(joined(lRow, if (m != null) m else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec. Injectable via
  * `graft.GraftExtensions` (session construction) or added idempotently
  * to `spark.experimental.extraStrategies` by [[AsOf.join]] (live
  * sessions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, tol) :: Nil
    case _ => Nil
  }
}

/** Public DataFrame-level API for the native as-of join. */
object AsOf {
  /** As-of join: every `left` row gains the columns of the closest
    * `right` row with equal `keys` — the latest `rightTime <= leftTime`
    * (backward, default) or the earliest `rightTime >= leftTime`
    * (`direction = "forward"`) — nulls when none (or none within
    * `toleranceUs`). Right-side columns are suffixed with `rightSuffix`.
    * Time columns must be LongType (epoch micros). A row with a NULL
    * key component never matches — not even another NULL — exactly as
    * a SQL equi-join (and pandas merge_asof) treats null keys.
    *
    * `left` and `right` must not share attribute lineage (read the
    * table twice for a self as-of) — enforced below.
    *
    * Determinism: the matched TIME is always deterministic. When several
    * right rows tie on (key, rightTime), the returned payload row is one
    * of the tied rows but which one depends on the sort's input order —
    * if payload determinism under ties matters, make `rightTime` a total
    * order (e.g. ts*1e6 + id) before joining.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightSuffix: String = "_r",
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    require(lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty,
      "as-of join sides share attribute lineage; re-read the right side")
    // fresh aliases on the right: disambiguates names in the joined output
    val rPlan = Project(
      rPlan0.output.map(a => Alias(a, a.name + rightSuffix)()), rPlan0)

    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))

    val node = AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)),
      keys.map(k => attr(rPlan, k + rightSuffix)),
      attr(lPlan, leftTime),
      attr(rPlan, rightTime + rightSuffix),
      forward = direction == "forward",
      toleranceUs = toleranceUs)
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, node)
  }
}
