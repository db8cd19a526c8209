package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.{Relational, Dedup}

/** Property-based invariants (SURVEY.md §5.3), driven by ScalaCheck
  * generators with fixed seeds (Spark round-trips are expensive, so a
  * bounded number of generated cases per property). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 30L), Gen.alphaStr.map(_.take(8))))

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("merge is idempotent: merge(merge(t,u),u) == merge(t,u)") {
    import spark.implicits._
    cases(Gen.zip(rowsGen, rowsGen), 5).foreach { case (t, u) =>
      val target = t.toDF("id", "v").dropDuplicates("id")
      val updates = u.toDF("id", "v").dropDuplicates("id")
      val once = Relational.merge(target, updates, "id")
      val twice = Relational.merge(once, updates, "id")
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }

  test("merge: every update key wins; non-updated target rows survive") {
    import spark.implicits._
    cases(Gen.zip(rowsGen, rowsGen), 5).foreach { case (t, u) =>
      val target = t.toDF("id", "v").dropDuplicates("id")
      val updates = u.toDF("id", "v").dropDuplicates("id")
      val merged = Relational.merge(target, updates, "id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val tm = target.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val um = updates.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(merged == tm ++ um)
    }
  }

  test("anti ⊕ semi join partitions the left side") {
    import spark.implicits._
    cases(Gen.zip(rowsGen, rowsGen), 5).foreach { case (l, r) =>
      val left = l.toDF("id", "v")
      val right = r.toDF("id", "w").select(col("id"))
      val anti = left.join(right, Seq("id"), "left_anti")
      val semi = left.join(right, Seq("id"), "left_semi")
      assert(anti.count() + semi.count() == left.count())
      assert(anti.select("id").collect().map(_.getLong(0)).toSet
        .intersect(semi.select("id").collect().map(_.getLong(0)).toSet).isEmpty)
    }
  }

  test("shingles: distinct, substring windows, ≤3 words") {
    import spark.implicits._
    val wordsGen = Gen.nonEmptyListOf(Gen.oneOf("join", "scan", "hash", "sort", "key"))
    cases(wordsGen, 8).foreach { words =>
      val text = words.mkString(" ")
      val out = Seq(text).toDF("text")
        .select(Dedup.shingleUdf(col("text")).as("sh"))
        .collect()(0).getSeq[String](0)
      assert(out.distinct == out)
      out.foreach(sh => assert(text.contains(sh)))
      assert(out.forall(_.split(" ").length <= 3))
    }
  }

  test("minhash: identical shingle sets give identical signatures") {
    import spark.implicits._
    val sh = Seq("a b c", "b c d", "c d e")
    val sigs = Seq((sh, sh)).toDF("x", "y")
      .select(Dedup.minhashSigs(col("x")).as("sx"), Dedup.minhashSigs(col("y")).as("sy"))
      .collect()(0)
    assert(sigs.getSeq[Long](0) == sigs.getSeq[Long](1))
  }
}
