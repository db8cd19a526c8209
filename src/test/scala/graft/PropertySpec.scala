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

  test("span hashes: UDF equals the declarative HOF form on random text") {
    import spark.implicits._
    // the exact expression the UDF's doc comment claims to reproduce
    val declarative =
      """transform(sequence(1, greatest(size(split(lower(text), ' ')) - 7, 1)),
        |  i -> md5(concat_ws(' ', slice(split(lower(text), ' '), i, 8))))"""
        .stripMargin
    val wordsGen = Gen.nonEmptyListOf(
      Gen.oneOf("Join", "scan", "HASH", "sort", "key", "x", ""))
    cases(wordsGen, 12).foreach { words =>
      val text = words.mkString(" ")
      val row = Seq(text).toDF("text")
        .select(Dedup.spanHashUdf(col("text")).as("udf"),
          expr(declarative).as("hof"))
        .collect()(0)
      assert(row.getSeq[String](0) == row.getSeq[String](1), s"text='$text'")
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

  // random (key, time) tables: the native single-pass merge must agree
  // with an order-independent reference computed per left row
  test("as-of join: native exec equals brute-force reference on random data") {
    import spark.implicits._
    val tableGen: Gen[List[(String, Long)]] =
      Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(0L, 20L)))
    cases(Gen.zip(tableGen, tableGen), 6).foreach { case (lRows, rRows) =>
      val l = lRows.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val r = rRows.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "rid")
      val got = graft.plans.AsOf.join(l, r,
          keys = Seq("k"), leftTime = "t", rightTime = "t")
        .select($"lid", $"t_r")
        .collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      // reference: per left row, max right time <= left time for the key
      val expected = lRows.zipWithIndex.map { case ((k, t), i) =>
        i.toLong -> rRows.filter(p => p._1 == k && p._2 <= t)
          .map(_._2).maxOption
      }.toMap
      assert(got == expected)

      val fwd = graft.plans.AsOf.join(l, r,
          keys = Seq("k"), leftTime = "t", rightTime = "t",
          direction = "forward")
        .select($"lid", $"t_r")
        .collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      val expectedFwd = lRows.zipWithIndex.map { case ((k, t), i) =>
        i.toLong -> rRows.filter(p => p._1 == k && p._2 >= t)
          .map(_._2).minOption
      }.toMap
      assert(fwd == expectedFwd)
    }
  }

  test("winnow kernel equals brute force on random ASCII strings") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.WinnowKernel.{B, K, M, W}
    val strGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))
    cases(strGen, 40).foreach { s =>
      val bytes = s.getBytes("UTF-8")
      val nh = bytes.length - K + 1
      val expected =
        if (nh < W) Seq.empty
        else {
          val h = (0 until nh).map { i =>
            (0 until K).foldLeft(0L)((acc, j) =>
              (acc * B + (bytes(i + j) & 0xffL)) % M)
          }
          (0 to nh - W).map(i => h.slice(i, i + W).min).distinct.sorted
        }
      val got = graft.functions.WinnowKernel
        .winnow(UTF8String.fromString(s)).toLongArray().toSeq
      assert(got == expected, s"input=${s.take(40)}")
    }
  }

  test("sssp distances bracket bfs hops: hops <= dist <= 9*hops on shared nodes") {
    // q_sssp and q_bfs_distance iterate the SAME hub set over the SAME
    // part graph with weights in [1,9]; for any node both settle, the
    // weighted distance must be between its hop count (min weight 1)
    // and 9× its hop count (max weight 9) — a cross-operator invariant
    // neither oracle states, so a relax/anti-join bug that preserved
    // each query's internal consistency would still trip it here.
    val spark = TestSpark.spark
    val bfs = graft.operators.Analytic.queries("q_bfs_distance")(
      spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sssp = graft.operators.Analytic.queries("q_sssp")(
      spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sssp.nonEmpty, "sssp settled no nodes on the fixture graph")
    val shared = bfs.keySet.intersect(sssp.keySet)
    assert(shared.nonEmpty)
    shared.foreach { n =>
      val h = bfs(n); val w = sssp(n)
      assert(w >= h && w <= 9 * h || (h == 0 && w == 0),
        s"node $n: hops=$h weighted=$w outside [hops, 9*hops]")
    }
    TestSpark.housekeeping()
  }

  test("HtmlDom.parse is total and structurally valid on arbitrary tag soup (r14)") {
    import graft.functions.HtmlDom
    // fragments biased toward the parser's hard paths: implied
    // closes, formatting reconstruction, stray closers, malformed
    // attributes, comments, raw-text elements
    val frag: Gen[String] = Gen.oneOf(
      Gen.oneOf("<p>", "</p>", "<b>", "</b>", "<i>", "</i>", "<div>",
        "</div>", "<li>", "<ul>", "</ul>", "<tr>", "<td>", "<table>",
        "</table>", "<section>", "</section>", "<hr>", "<br/>",
        "<option>", "<dt>", "<dd>", "<dl>", "</dl>", "<button>",
        "</button>", "<!--x-->", "<!--", "<script>a<b</script>",
        "<style>", "< ", "<", ">", "</", "<x"),
      Gen.alphaStr.map(_.take(6)),
      Gen.oneOf("<a href=x>", "<a href='y z'>", "<img src=\"q\"/>",
        "<em class=k id=m>", "<u data-v = 'w'>", "<b class>"))
    val htmlGen: Gen[String] =
      Gen.listOfN(40, frag).map(_.mkString)
    cases(htmlGen, 60).foreach { html =>
      val nodes = HtmlDom.parse(html) // must never throw
      nodes.zipWithIndex.foreach { case (nd, ix) =>
        // spans resolved and inside the document
        assert(nd.innerStart >= 0 && nd.innerEnd >= nd.innerStart &&
          nd.innerEnd <= html.length,
          s"bad span [${nd.innerStart},${nd.innerEnd}] for ${nd.tag} in: $html")
        // parents are earlier elements whose span contains the child's
        assert(nd.parent < ix, s"forward parent link at $ix in: $html")
        if (nd.parent >= 0) {
          val p = nodes(nd.parent)
          assert(nd.innerStart >= p.innerStart && nd.innerEnd <= p.innerEnd,
            s"child span escapes parent for ${nd.tag} in: $html")
        }
        // innerText never throws and stays in bounds
        HtmlDom.innerText(html, nd.innerStart, nd.innerEnd)
      }
    }
  }
}
