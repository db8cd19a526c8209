package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The coarse-quantizer delivery contract (graft.plans.CentroidScores):
  * K centroids ride as ONE reference object in ONE expression node, so
  * plan size / analysis cost / generated code are O(1) in K. This is the
  * r5→r6 fix for the sqrt-K rule: K = ceil(sqrt N) grows with the
  * corpus, so per-centroid LITERAL subtrees made the expression tree
  * grow with the data. Here we assert (a) the plan's expression-node
  * count is IDENTICAL for K=4 and K=256, and (b) the kernel's scores
  * are bit-identical to the old literal-array formulation (same round-9
  * HALF_UP cosine, same (v·v+c·c)−v·c·2 L2, same tie-break structs).
  */
class CentroidPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val DIM = 8

  private def corpus = {
    val rnd = new java.util.Random(11)
    val rows = (0L until 64L).map { id =>
      (id, Seq.fill(DIM)(rnd.nextDouble() * 2 - 1))
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .withColumn("nrm", graft.plans.VectorExpressions.norm(col("embedding")))
  }

  private def cents(k: Int): Array[(Long, Seq[Double], Double)] = {
    val rnd = new java.util.Random(7)
    Array.tabulate(k) { i =>
      val v = Seq.fill(DIM)(rnd.nextDouble() * 2 - 1)
      (i.toLong, v, math.sqrt(v.map(x => x * x).sum))
    }
  }

  private def planNodeCount(k: Int): Int = {
    val df = corpus
      .withColumn("arr", graft.plans.VectorExpressions.centroidCosines(
        col("embedding"), col("nrm"), cents(k)))
      .withColumn("centroid_id", array_max(col("arr")).getField("negcid") * -1)
      .select(col("vec_id"), col("centroid_id"))
    df.queryExecution.optimizedPlan
      .map(p => p.expressions.map(e => e.collect { case x => x }.size).sum)
      .sum
  }

  test("plan expression count does not grow with K (4 vs 256)") {
    val small = planNodeCount(4)
    val large = planNodeCount(256)
    assert(small === large,
      s"plan grew with K: $small nodes at K=4 vs $large at K=256")
  }

  test("kernel cosine scores match the literal-array formulation bit-wise") {
    import graft.plans.VectorExpressions.dot
    val cs = cents(5)
    // The pre-r6 construction: K unrolled literal subtrees.
    val literalArr = array(cs.map { case (cid, cv, cnrm) =>
      struct(
        round(dot(col("embedding"), typedlit(cv)) / (col("nrm") * lit(cnrm)), 9)
          .as("sim"),
        lit(-cid).as("negcid"))
    }: _*)
    val kernelArr = graft.plans.VectorExpressions.centroidCosines(
      col("embedding"), col("nrm"), cs)
    val diff = corpus
      .withColumn("a", literalArr).withColumn("b", kernelArr)
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(diff === 0L, s"$diff rows diverge between kernel and literal scores")
  }

  test("kernel L2 scores match the literal-array formulation bit-wise") {
    import graft.plans.VectorExpressions.dot
    val cs: Seq[(Int, Seq[Double])] = cents(5).map { case (cid, cv, _) => (cid.toInt, cv) }.toSeq
    def d2(c: Seq[Double]) =
      dot(col("embedding"), col("embedding")) + dot(typedlit(c), typedlit(c)) -
        dot(col("embedding"), typedlit(c)) * 2
    val literalArr = array(cs.map { case (k, c) =>
      struct(d2(c).as("d2"), lit(k).as("k"))
    }: _*)
    val kernelArr = graft.plans.VectorExpressions.centroidL2(col("embedding"), cs)
    val diff = corpus
      .withColumn("a", literalArr).withColumn("b", kernelArr)
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(diff === 0L, s"$diff rows diverge between kernel and literal L2 scores")
  }

  test("whole-stage codegen survives the kernel (no fallback projection)") {
    // Over parquet, not a local Seq — ConvertToLocalRelation folds a
    // LocalRelation projection at plan time and leaves no codegen span.
    val dim64cents = {
      val rnd = new java.util.Random(7)
      Array.tabulate(16) { i =>
        val v = Seq.fill(64)(rnd.nextDouble() * 2 - 1)
        (i.toLong, v, math.sqrt(v.map(x => x * x).sum))
      }
    }
    val df = Tables(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .withColumn("nrm", graft.plans.VectorExpressions.norm(col("embedding")))
      .withColumn("arr", graft.plans.VectorExpressions.centroidCosines(
        col("embedding"), col("nrm"), dim64cents))
      .withColumn("centroid_id", array_max(col("arr")).getField("negcid") * -1)
      .select(col("vec_id"), col("centroid_id"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty,
      s"no codegen span in:\n${df.queryExecution.executedPlan}")
    // The scoring projection itself must sit INSIDE a codegen span (a
    // fallback expression would hang as a separate interpreted Project).
    val scoringInside = codegenSpans.exists(
      _.toString.contains("graft_centroid_scores"))
    assert(scoringInside,
      s"scoring projection fell out of codegen:\n${df.queryExecution.executedPlan}")
  }
}
