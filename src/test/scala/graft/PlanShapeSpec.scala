package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Physical-plan assertions (SURVEY.md §4): the optimizations we rely on
  * must actually appear in the executed plan — filters pushed to the
  * parquet scan, columns pruned, small dims broadcast. These are the
  * properties that keep the plans viable at 1000× the data. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def executedPlan(name: String): String =
    Relational.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("ingest slice: status filter is pushed to the orders parquet scan") {
    val plan = executedPlan("q_ingest_dedup")
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(o_orderstatus,F)"), plan.take(2000))
  }

  test("ingest slice: supplier dim joins as broadcast, dedup as anti-join") {
    val plan = executedPlan("q_ingest_dedup")
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("LeftAnti"))
  }

  test("column pruning: q1_agg scans only the aggregation columns") {
    val plan = executedPlan("q1_agg")
    val schemaLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(schemaLine.contains("l_returnflag") && schemaLine.contains("l_quantity"))
    assert(!schemaLine.contains("l_shipdate") && !schemaLine.contains("l_partkey"),
      schemaLine)
  }

  test("multi-way enrichment: all three dims broadcast") {
    val plan = executedPlan("q_inner_enrich")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(3000))
  }

  test("binned range join plans as an equi-join, not a nested loop") {
    val plan = graft.operators.Extras.queries("q_range_join")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(3000))
    assert(plan.contains("Join") || plan.contains("HashJoin"), plan.take(3000))
  }

  test("global top-k plans as TakeOrderedAndProject (no full sort)") {
    val plan = executedPlan("q_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("etl pipeline: dims broadcast, no cartesian beyond the 1-row scalar joins") {
    val df = graft.operators.Pipeline.queries("q_etl_pipeline")(
      spark, TestSpark.sf)
    // Execute df's OWN QueryExecution (count() would spin up a separate
    // one and leave this plan an un-finalized AdaptiveSparkPlanExec):
    // after collect(), executedPlan.toString prints the AQE FINAL plan.
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // locations dim + the tiny scalar sides must come in as broadcasts
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("etl pipeline: enriched subtree cached once, read by every branch") {
    // The recompute fix in Pipeline.scala was previously protected
    // only by comments; lock it in. Exactly ONE persist point exists
    // (the enriched batch — r5 removed the parsed-page cache after
    // the columnar write grew costlier than the 0.2 s parse it saved),
    // it is consumed by >= 2 downstream branches, and the JSON parse
    // must live ONLY inside that cached relation: if a code change
    // re-introduced a parse outside the cache (e.g. the merge probe
    // re-deriving updates from raw pages), a from_json would
    // re-appear in the optimized plan proper and multiply the whole
    // parse+enrich subtree per consumer again.
    import org.apache.spark.sql.catalyst.expressions.JsonToStructs
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    // start from a clean cache registry: a full-result cache left by an
    // earlier suite (PipelineSpec caches the whole pipeline output)
    // would substitute the ENTIRE plan with one InMemoryRelation and
    // hide the internal persist point this test asserts
    TestSpark.housekeeping()
    val df = graft.operators.Pipeline.queries("q_etl_pipeline")(
      spark, TestSpark.sf)
    df.collect()
    val opt = df.queryExecution.optimizedPlan
    val enriched = opt.collect { case r: InMemoryRelation => r }
    assert(enriched.size >= 2, s"expected >=2 enriched-cache reads, got ${enriched.size}")
    assert(enriched.map(_.cacheBuilder).distinct.size == 1,
      "branches read different caches — exchange/cache reuse broken")
    // InMemoryRelation is a leaf of the optimized plan, so this only
    // sees expressions OUTSIDE the cached subtree:
    def jsonParses(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      exprs.flatMap(_.collect { case j: JsonToStructs => j })
    assert(jsonParses(opt.collect { case p => p.expressions }.flatten).isEmpty,
      "JSON parse re-appears outside the cache")
    // ...and the parse lives INSIDE the cached plan (both dialect
    // branches of the single-parse dispatch). AQE wraps cached plans
    // in AdaptiveSparkPlanExec / QueryStageExec whose inner plan is
    // not a `children` member, so descend explicitly:
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def deepNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => deepNodes(a.executedPlan)
      case q: QueryStageExec        => deepNodes(q.plan)
      case _: InMemoryTableScanExec => Nil // don't cross into a cache
      case other                    => other.children.flatMap(deepNodes)
    })
    val enrichedNodes = deepNodes(enriched.head.cacheBuilder.cachedPlan)
    assert(jsonParses(enrichedNodes.flatMap(_.expressions)).nonEmpty,
      "the enriched cache does not contain the JSON parse — wrong subtree cached")
    TestSpark.housekeeping()
  }

  test("bucketed near-dup joins on the bucket key — never a cross product") {
    val df = graft.operators.Similarity.queries("q_neardup_embedding")(
      spark, TestSpark.sf)
    df.collect() // finalize AQE — assert on the plan that actually ran
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("geo knn candidates arrive through the cell equi-join — never a cross product") {
    val df = graft.operators.Scalars.queries("q_geo_knn")(spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("triangle wedges close through equi-joins — never a cross product") {
    val df = graft.operators.Analytic.queries("q_triangles")(
      spark, TestSpark.sf)
    df.collect() // finalize AQE — assert on the plan that actually ran
    val plan = df.queryExecution.executedPlan.toString
    TestSpark.housekeeping() // the oriented adjacency is persisted
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("bm25 / pmi top-k plans end in TakeOrderedAndProject") {
    for (q <- Seq("q_bm25", "q_pmi_bigrams")) {
      val plan = graft.operators.TextAnalytics.queries(q)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), s"$q: ${plan.take(2000)}")
    }
  }

  test("dedup funnel: every stage joins by key — no cartesian product") {
    val df = graft.operators.Dedup.queries("q_dedup_pipeline")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("curation flagship: the composed funnel adds no cartesian product") {
    val df = graft.operators.Curation.queries("q_curation_pipeline")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    TestSpark.housekeeping()
  }

  test("span/sentence dedup join only on hash keys — no cartesian product") {
    for (q <- Seq("q_dedup_substring", "q_dedup_sentences")) {
      val df = graft.operators.Dedup.queries(q)(spark, TestSpark.sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(3000)}")
      assert(!plan.contains("BroadcastNestedLoop"), s"$q: ${plan.take(3000)}")
      TestSpark.housekeeping() // these queries persist() their hash frame
    }
  }

  test("64-bit pHash pairs come from block-keyed joins only — no cartesian") {
    // the 2^64 fingerprint domain means the distinct-hash frame is
    // corpus-sized, so unlike the 16-bit aHash this join has no
    // domain bound to hide behind — the pigeonhole equi-join IS the
    // scale device and the plan must show a hash join on (blk, bits)
    val df = graft.operators.Multimodal
      .queries("q_phash64_hamming")(spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
  }

  test("semdedup pairs form within clusters only — never a cross product") {
    // Centroid assignment is a map-side literal projection; the only
    // pair source is the self equi-join on centroid_id, whose fan-out
    // stays ~N^1.5 because K = ceil(sqrt(N)) tracks the corpus size.
    val df = graft.operators.Similarity.queries("q_semdedup")(spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("embedding flagship: the composed funnel adds no cartesian product") {
    // four stages, one plan: the only pair source is still the
    // cluster-keyed self equi-join (q_semdedup's bound); quality is a
    // narrow projection and balance a per-label window
    val df = graft.operators.Similarity.queries("q_embedding_pipeline")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // (a BroadcastNestedLoopJoin IS present and fine: the 1-row
    // broadcast minority-target cross join — the q_class_balance
    // device, never a pair source)
    TestSpark.housekeeping() // the corpus frame persists
  }

  test("k-means assignment is map-side: no join anywhere in the final plan") {
    // Assignment folds K literal centroids into a projection; the only
    // shuffles are the cluster aggregation and the verification sort.
    val df = graft.operators.Similarity.queries("q_kmeans")(spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("weighted sample is a global top-k: TakeOrderedAndProject, no full sort") {
    val df = graft.operators.Extras.queries("q_weighted_sample")(
      spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    // the corpus-side selection must be the partial top-k operator; the
    // rank window that follows runs over the already-selected 100 rows
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("source overlap: no word's pair-join side exceeds S/2 (Zipf-head hot key gone)") {
    import org.apache.spark.sql.functions._
    val vocab = Tables(spark, TestSpark.sf, "documents")
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().persist()
    try {
      val S = vocab.select(col("source")).distinct().count()
      // the implementation splits at df*2 > S: low side joins words with
      // df ≤ S/2, high side joins ABSENT sets of size S-df < S/2 — so
      // the per-word join-side cardinality is min(df, S-df) ≤ S/2
      val maxSide = vocab.groupBy(col("w"))
        .agg(count(lit(1)).as("df"))
        .select(max(least(col("df"), lit(S) - col("df"))))
        .head().getLong(0)
      assert(maxSide <= S / 2, s"max join side $maxSide > S/2 (S=$S)")
      // and the testdata genuinely exercises the high-df branch
      val maxDf = vocab.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .agg(max(col("df"))).head().getLong(0)
      assert(maxDf * 2 > S,
        s"fixture has no high-df word (maxDf=$maxDf, S=$S) — branch untested")
    } finally {
      vocab.unpersist()
      TestSpark.housekeeping()
    }
  }

  test("source overlap: inclusion–exclusion split equals the naive pair join") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.TextAnalytics.queries("q_source_overlap")(
      spark, TestSpark.sf)
    val naiveVocab = Tables(spark, TestSpark.sf, "documents")
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
    val naive = naiveVocab.as("a")
      .join(naiveVocab.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("n_common"))
    val gotPairs = got.select("s1", "s2", "n_common")
      .collect().map(_.toSeq).toSet
    val naivePairs = naive.collect().map(_.toSeq).toSet
    TestSpark.housekeeping()
    assert(gotPairs == naivePairs)
  }

  test("stratified sample ranks inside source partitions — one window, no join") {
    val df = graft.operators.Extras.queries("q_stratified_sample")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("interval union measure is pure window work — no join anywhere") {
    val df = graft.operators.Extras.queries("q_interval_union_len")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("js divergence joins only on word/source keys — no cartesian product") {
    val df = graft.operators.TextAnalytics.queries("q_js_divergence")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the only nested-loop is the 1-row corpus-total broadcast (count
    // inside the FINAL plan only — the AQE string repeats the tree in
    // its "Initial Plan" section)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalPlan).size <= 1,
      finalPlan.take(3000))
  }

  test("random projection plans with no shuffle before the output sort") {
    val df = graft.operators.Similarity.queries("q_project_rp")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
    // exactly the one exchange feeding the global output sort
    assert("Exchange".r.findAllIn(plan).size <= 2, plan.take(3000))
  }

  test("table stats: the four NDVs share ONE Expand pass, no join") {
    val plan = graft.operators.Analytic.queries("q_table_stats")(
      spark, TestSpark.sf).queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size == 1, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("regression: one aggregation pass over the scan, no join/window") {
    val plan = graft.operators.Analytic.queries("q_regression")(
      spark, TestSpark.sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan.take(3000))
    // partial + final HashAggregate around a single exchange pair
    // (one for the group-by, one for the output sort)
    assert("Exchange".r.findAllIn(plan).size <= 2, plan.take(3000))
  }

  test("k-core final plan joins by node key — never a cross product") {
    val df = graft.operators.Analytic.queries("q_kcore")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    TestSpark.housekeeping() // the loop localCheckpoints edge frames
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan.take(3000))
  }

  test("chi-square margins are windows over the CELL frame, corpus " +
    "touched by exactly one aggregation") {
    val plan = graft.operators.Analytic.queries("q_chi_square")(
      spark, TestSpark.sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
    // the corpus-scaled work is the single partial+final HashAggregate
    // pair building cells; everything after operates on the tiny grid
    val scanCount = "FileScan".r.findAllIn(plan).size
    assert(scanCount == 1, plan.take(3000))
  }

  test("link prediction and ECDF candidates arrive through equi-joins") {
    for (q <- Seq("q_link_predict", "q_cdf_normalize", "q_setsim_prefix",
        "q_skyline", "q_snapshot_diff", "q_forecast_eval")) {
      val df = SparkEntry.queries(q)(spark, TestSpark.sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(3000)}")
      assert(!plan.contains("BroadcastNestedLoop"), s"$q: ${plan.take(3000)}")
      TestSpark.housekeeping()
    }
  }

  test("ewma is one window pass: no join, one corpus scan") {
    val plan = graft.operators.Analytic.queries("q_ewma")(
      spark, TestSpark.sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
    assert("FileScan".r.findAllIn(plan).size == 1, plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("fd audit: ONE orders scan fans out via Expand/stack, no join") {
    val plan = graft.operators.Discovery.queries("q_fd_discovery")(
      spark, TestSpark.sf).queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size == 1, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("item CF pairs and degrees join by key — never a cross product") {
    val df = graft.operators.Analytic.queries("q_item_cf")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("hits lineage is truncated per half-step: compact checkpoint-fed " +
      "final plan, no cartesian") {
    val df = graft.operators.Analytic.queries("q_hits")(spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // every iteration references its raw frame twice (sum join + max),
    // so an un-truncated lineage re-expands ~2x per half-step — the
    // first cut of this query showed 44 nested-loop replays in one
    // plan. With per-half-step localCheckpoint the final plan reads
    // the checkpointed score frames and does ONLY the top-k/union tail.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("ExistingRDD") || plan.contains("LocalTableScan"),
      plan.take(3000))
    assert(plan.linesIterator.size < 40,
      s"final plan should be the compact tail, got:\n${plan.take(3000)}")
  }

  test("kaplan-meier collapses to the duration grid before its windows") {
    val df = graft.operators.Inference.queries("q_kaplan_meier")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the corpus-scaled work: session windows + grid agg; the grid
    // windows (risk set, product limit) run after the aggregation
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("record linkage candidates arrive through the blocking equi-join") {
    val df = graft.operators.Discovery.queries("q_record_linkage")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("seq patterns and seasonal decompose are window+grid work, no join") {
    Seq("q_seq_patterns" -> graft.operators.Analytic.queries,
      "q_seasonal_decompose" -> graft.operators.Analytic.queries)
      .foreach { case (name, qs) =>
        val plan = qs(name)(spark, TestSpark.sf)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("Join"), s"$name:\n${plan.take(3000)}")
        assert("FileScan".r.findAllIn(plan).size == 1, plan.take(3000))
        assert(plan.contains("Window"), plan.take(3000))
      }
  }

  test("seq patterns top-20 plans as TakeOrderedAndProject") {
    val plan = graft.operators.Analytic.queries("q_seq_patterns")(
      spark, TestSpark.sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("zipf ranks only the TakeOrdered top-100, never the whole vocab") {
    val plan = graft.operators.TextAnalytics.queries("q_zipf")(
      spark, TestSpark.sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("bootstrap/permutation grids aggregate map-side from one scan") {
    Seq("q_bootstrap_ci", "q_permutation_test").foreach { name =>
      val plan = graft.operators.Inference.queries(name)(
        spark, TestSpark.sf).queryExecution.executedPlan.toString
      // one events scan feeds the replicate grid; the 1-row full-
      // sample estimate may rescan once — never more
      assert("FileScan".r.findAllIn(plan).size <= 2, plan.take(3000))
      assert(!plan.contains("CartesianProduct"), plan.take(3000))
      assert(plan.contains("HashAggregate"), plan.take(3000))
    }
  }

  test("hard negatives probe through a broadcast of the 10-row anchor side") {
    val df = graft.operators.Similarity.queries("q_hard_negatives")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the label-inequality join is non-equi, so the legal shape is one
    // BroadcastNestedLoopJoin with the TINY anchor set broadcast — the
    // corpus side must stream, never sit in a CartesianProduct
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalPlan).size <= 1,
      finalPlan.take(3000))
    TestSpark.housekeeping()
  }

  test("token budget is one scan + grid windows — no join anywhere") {
    val df = graft.operators.Extras.queries("q_token_budget")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // per-source weights come from one documents scan; the 1-row total
    // joins back as a broadcast; apportionment is windows over the
    // |sources|-row grid — nothing else may join or rescan (count in
    // the FINAL plan only; the AQE string repeats the tree in its
    // "Initial Plan" section)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(finalPlan).size <= 2,
      finalPlan.take(3000))
    assert(finalPlan.contains("Window"), finalPlan.take(3000))
    TestSpark.housekeeping()
  }

  test("shard plan is one scan + 32-row grid windows — no join anywhere") {
    val df = graft.operators.Extras.queries("q_shard_plan")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(finalPlan).size <= 1,
      finalPlan.take(3000))
    assert(!finalPlan.contains("Join"), finalPlan.take(3000))
    TestSpark.housekeeping()
  }

  test("curation report: hash-group + grid joins only — no cartesian product") {
    val df = graft.operators.Extras.queries("q_curation_report")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    TestSpark.housekeeping()
  }

  test("audio features stay a narrow map until the presentation sort") {
    val df = graft.operators.Multimodal.queries("q_audio_features")(
      spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    // binary decode is mapPartitions; no join, no aggregate — the only
    // exchange is the final orderBy
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("HashAggregate"), plan.take(3000))
    TestSpark.housekeeping()
  }

  test("tail index: top-51 is a TakeOrdered, never a key-set sort") {
    val df = graft.operators.Extras.queries("q_tail_index")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    TestSpark.housekeeping()
  }

  test("negative sampling: probes broadcast, the vocab streams once") {
    val df = graft.operators.TextAnalytics.queries("q_negative_sampling")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the interval condition is a range — the ONLY sound physical
    // shape is the 100-row probe side broadcast into a nested loop;
    // a corpus-side sort-merge or cartesian over probes would be the
    // scale bug
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    TestSpark.housekeeping()
  }

  test("hash ring: vnode successor joins broadcast, keys never sort") {
    val df = graft.operators.Extras.queries("q_hash_ring")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    TestSpark.housekeeping()
  }

  test("join cardinality audit: grid equi-joins, no nested loop on grids") {
    val df = graft.operators.Extras.queries("q_join_card")(
      spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // truth comes from count-grid equi-joins; the only NLJ-ish nodes
    // allowed are the 1-row scalar cross joins
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    TestSpark.housekeeping()
  }
}
