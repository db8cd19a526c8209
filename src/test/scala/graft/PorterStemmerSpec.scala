package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PorterStemmer.stem

/** Vectors from the published algorithm description (Porter 1980) and the
  * canonical examples on the algorithm's public page. */
class PorterStemmerSpec extends AnyFunSuite {

  val vectors: Seq[(String, String)] = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic", "differentli" -> "differ",
    "vileli" -> "vile", "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // general
    "running" -> "run", "connection" -> "connect", "connections" -> "connect")

  test("published Porter vectors") {
    val bad = vectors.collect { case (in, want) if stem(in) != want =>
      s"$in: got ${stem(in)}, want $want"
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("edge cases") {
    assert(stem(null) == null)
    assert(stem("") == "")
    assert(stem("a") == "a")
    assert(stem("http://x") == "http://x") // non-alpha passes through
    assert(stem("BIG") == "BIG")           // uppercase passes through (pre-lowered upstream)
  }

  test("idempotent-ish on already-stemmed short words") {
    Seq("cat", "run", "spark", "tabl").foreach(w => assert(stem(w).nonEmpty))
  }

  test("codegen Stem expression matches the UDF on every vector + nulls") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val words = vectors.map(_._1).map(Option(_)) :+ Option.empty[String]
    val rows = words.toDF("w").select(
      graft.functions.StemExpression.stem(col("w")).as("native"),
      graft.operators.TextAnalytics.stemUdf(col("w")).as("viaUdf"))
      .collect()
    rows.foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }

  test("Stem stays inside whole-stage codegen (no UDF boundary)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.{col, lower}
    // a parquet-backed plan (a local Seq would be constant-folded away)
    val df = Tables(spark, TestSpark.sf, "documents")
      .select(graft.functions.StemExpression.stem(lower(col("lang"))).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(1)" prefix marks the whole-stage-codegen span: graft_stem
    // projects inside it, fused with the scan
    assert(plan.contains("*(1) Project [graft_stem"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(df.limit(1).collect()(0).getString(0).nonEmpty)
  }
}
