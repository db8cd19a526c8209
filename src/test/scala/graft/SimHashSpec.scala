package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_simhash kernel vs the nested-HOF SQL formulation it replaces
  * (which is also the DuckDB oracle's form): identical fingerprints. */
class SimHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val hofForm =
    """array_join(transform(sequence(1, 32), i ->
      |  CASE WHEN aggregate(split(lower(text), ' '), 0, (acc, w) ->
      |    acc + CASE WHEN instr('0123456789abcdef', substring(md5(w), i, 1)) - 1 >= 8
      |              THEN 1 ELSE -1 END) >= 0
      |  THEN '1' ELSE '0' END), '')""".stripMargin

  test("kernel equals the HOF formulation on real documents") {
    val both = Tables(spark, TestSpark.sf, "documents").limit(50)
      .select(
        graft.functions.SimHashExpression.simhash(col("text")).as("fast"),
        expr(hofForm).as("hof"))
      .collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1)))
    assert(both.forall(_.getString(0).length == 32))
  }

  test("edge cases: empty string, consecutive spaces, SQL registration") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rows = Seq("", "a  b", "Tacos TACOS tacos").toDF("text")
      .select(
        graft.functions.SimHashExpression.simhash(col("text")).as("fast"),
        expr(hofForm).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    val viaSql = spark.sql("SELECT graft_simhash('hello world') AS s")
      .collect()(0).getString(0)
    assert(viaSql.length == 32 && viaSql.forall(c => c == '0' || c == '1'))
  }
}
