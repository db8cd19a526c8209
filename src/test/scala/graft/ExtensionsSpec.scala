package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("graft_dot is callable from SQL after registration") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("graft_stem is callable from SQL after registration") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_stem('relational') AS s").collect()(0).getString(0)
    assert(r == "relat")
  }

  test("graft_dot matches the interpreted HOF result on real embeddings") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val e = Tables(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val both = e.select(
      graft.plans.VectorExpressions.dot(col("v"), col("v")).as("native"),
      expr("aggregate(sequence(1, size(v)), cast(0 as double), (acc, i) -> acc + element_at(v, i) * element_at(v, i))").as("hof"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_dom_text / graft_dom_attr are callable from SQL after registration") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_dom_text('<div class="box"><p>a</p><p>b</p></div>', '.box p') AS t,
        |  graft_dom_attr('<a href=//x.y title=Hi>z</a>', 'a', 'title') AS h,
        |  graft_dom_attr('<a>z</a>', 'a', 'title') AS missing
        |""".stripMargin).collect()(0)
    assert(row.getSeq[String](0) == Seq("a", "b"))
    assert(row.getSeq[String](1) == Seq("Hi"))
    assert(row.getSeq[String](2) == Seq(null))
  }

  test("dom functions: wrong arity is an analysis error naming the signature, not an internal error") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    for (bad <- Seq(
        "SELECT graft_dom_text('<p>x</p>')",
        "SELECT graft_dom_text('<p>x</p>', 'p', 'extra')",
        "SELECT graft_dom_attr('<p>x</p>', 'p')")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(bad).collect()
      }
      assert(e.getMessage.contains("graft_dom"), s"$bad: ${e.getMessage}")
    }
  }

  test("dom functions: NULL literals coerce and null-propagate like builtin string functions") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_dom_text(NULL, 'p') AS a,
        |       graft_dom_text('<p>x</p>', NULL) AS b,
        |       graft_dom_attr('<p>x</p>', 'p', NULL) AS c""".stripMargin)
      .collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }
}
