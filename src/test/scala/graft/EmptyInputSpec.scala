package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-input totality: a 100 TB deployment routinely plans over
  * empty partitions, empty date slices, and freshly-truncated tables —
  * operators must degrade to an empty (or well-defined constant)
  * result, never throw. This spec materializes a schema-identical but
  * EMPTY copy of every testdata table and drives a broad query subset
  * over it. Queries excluded here have a documented non-empty
  * precondition (model fitting like LDA/BPE/k-means needs a corpus;
  * the composed pipelines inherit it).
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty")
      .toFile.getAbsolutePath
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      Tables(spark, TestSpark.sf, t).limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // every query here must return an EMPTY result on empty inputs
  private val emptyTotal = Seq(
    "q1_agg", "q_topk", "q_filter_blocklist", "q_anti_join_dedup",
    "q_latest_per_key", "q_semi_join", "q_left_outer_enrich",
    "q_inner_enrich", "q_union_source", "q_delete_antijoin",
    "q_window_lag", "q_window_rank", "q_sessionize", "q_session_window",
    "q_histogram", "q_stats_exact", "q_outliers", "q_rolling_dau",
    "q_event_transitions", "q_word_freq", "q_stopword_filter",
    "q_lang_id", "q_quality_score", "q_scrub_pii", "q_token_stats",
    "q_dedup_exact", "q_dedup_sentences", "q_dedup_substring",
    "q_simhash_hamming", "q_setsim_prefix", "q_rake_keywords",
    "q_regression", "q_chi_square", "q_decay_score", "q_full_outer",
    "q_incremental_agg", "q_kcore", "q_bfs_distance", "q_sssp",
    "q_random_walks", "q_attribution", "q_ldiversity", "q_cdf_normalize",
    "q_link_predict", "q_ewma", "q_skyline", "q_psi_drift",
    "q_zscore_anomaly", "q_session_paths", "q_snapshot_diff",
    "q_forecast_eval", "q_readability", "q_wilson_rank", "q_mutual_info",
    "q_triangles",
    "q_cc_stars", "q_image_phash", "q_split_hash", "q_weighted_sample",
    "q_stratified_sample", "q_interval_union_len", "q_zorder_layout",
    "q_scd2", "q_pivot", "q_setops", "q_gap_fill", "q_asof_join",
    "q_range_join", "q_cohort_retention", "q_rollup",
    "q_grouping_sets", "q_cube", "q_fd_discovery", "q_benford", "q_cusum",
    "q_gini", "q_spearman", "q_source_overlap", "q_clustering_coeff",
    "q_item_cf", "q_markov_eval", "q_kaplan_meier", "q_feature_hash",
    "q_compaction_plan", "q_stream_cusum", "q_stream_drift", "q_zipf",
    "q_impute", "q_erasure_maintenance", "q_freshness", "q_seq_patterns",
    "q_seasonal_decompose", "q_acf", "q_assortativity", "q_geo_fence",
    "q_stream_freshness",
    // r8: DOM extraction / alert rows / tables derive their markup
    // from customer rows (no rows → no pages → empty, not a parser
    // crash); audio frames from documents; the budget allocator and
    // cluster formation must survive an empty corpus; hard negatives
    // an empty embedding table; the streaming alert drain an empty
    // event stream
    "q_dom_extract", "q_dom_table", "q_alert_rows", "q_audio_features",
    "q_token_budget", "q_dedup_clusters", "q_hard_negatives",
    "q_stream_alerts",
    // r8 close: the composed curation grid, the shard plan and the
    // streamed vote all collapse to empty grids on an empty corpus
    "q_curation_report", "q_shard_plan", "q_stream_label_vote",
    "q_dedup_threshold_curve", "q_ivf_tuning",
    // r9: three of the eval quartet collapse to an empty grid on an
    // empty corpus (no scores → no thresholds/bins/argmax rows);
    // q_auc instead reports a single null-metric row — dedicated test
    "q_pr_curve", "q_ks_test", "q_calibration",
    // the composed curation flagship: empty corpus → empty funnel
    "q_curation_pipeline",
    // restart recovery on an empty stream: the kill/resume machinery
    // must still run (empty files are still micro-batches) and the
    // recovered sink is empty, not an error
    "q_stream_restart",
    // percentile pruning of an empty corpus is an empty verdict table
    // (q_kcenter_seeds is excluded: seed selection needs a corpus,
    // the k-means/LDA precondition)
    "q_percentile_prune", "q_split_leakage",
    // the quantile fold on an empty stream: a null-sketch state row,
    // an empty gate frame — not a crash
    "q_stream_quantile",
    // snapshot drift of an empty corpus: two empty centroid grids
    // (q_tokenizer_fertility is excluded: the BPE learn needs a
    // corpus, like q_tokenize_bpe)
    "q_embedding_drift",
    // incremental admission of an empty arriving batch against an
    // empty index: no verdicts, not a crash (the ANN twin
    // short-circuits on a zero-centroid stored model)
    "q_dedup_incremental", "q_ann_incremental",
    // composed IVF-PQ over an empty index: no stored model (the
    // 10+nCodes floor), scan and recall curve both degrade to empty
    "q_ann_ivfpq", "q_ann_ivfpq_recall", "q_ann_ivfpq_residual",
    // r12: scalar-quantization recall sweep of an empty corpus — no
    // queries, no scales, an empty grid; the Lloyd-trained IVF-PQ
    // sweep short-circuits on the missing stored model (same floor
    // as q_ann_ivfpq)
    "q_sq8_recall", "q_ann_ivfpq_lloyd",
    // streaming admission of an empty corpus: zero batches leave no
    // stats state and there is no arriving batch to score; the vector
    // twin short-circuits on the missing stored model before staging;
    // the dedup twin probes empty index frames and admits nothing
    "q_stream_bm25_admission", "q_stream_ann_admission",
    "q_stream_dedup_admission",
    // media gate of an empty stream: zero batches, no count grid
    "q_stream_media_gate",
    // r12: NN-Descent over an empty corpus — no nodes, no seed blocks,
    // no edges at any round, an empty graph / recall frame; image
    // admission probes an empty stored index and admits nothing (batch
    // and drain); compaction exec short-circuits on an empty manifest
    "q_ann_graph", "q_ann_graph_recall", "q_ann_beam",
    "q_ann_graph_admission",
    // r13: the layered A/B over an empty corpus — no nodes, an empty
    // upper sample (sqrtK(0)=0), both arms' walks empty; the unigram
    // trainer degrades to an empty piece table (no driver argmax to
    // crash, unlike BPE's excluded learn loop)
    "q_ann_layered", "q_unigram_lm", "q_unigram_encode",
    "q_phash_admission", "q_stream_phash_admission", "q_compaction_exec",
    // packing an empty corpus: no tokens, no sequences — batch and
    // the order-dependent drain (zero-row staged files still drain;
    // the pack cursor state stays empty)
    "q_seq_pack", "q_stream_seq_pack", "q_seq_manifest",
    // r13: encoding an empty corpus under an empty trained model —
    // zero-row staged files still drain, the apply map never fires
    "q_stream_unigram_encode",
    // kill-and-resume over empty sketch state: three empty files are
    // still three micro-batches, the planted death and the recovery
    // both still run, and the recovered gate frame is empty
    "q_stream_quantile_restart",
    // the HLL fold on an empty stream: zero micro-batches, no state
    // dir, an empty gate frame — not a crash
    "q_stream_hll",
    // near-dup image matching of an empty corpus: no fingerprints →
    // no block candidates → no pairs (both hash widths, and the
    // cross-modal composition on top of them)
    "q_phash_hamming", "q_phash64_hamming", "q_crossmodal_dedup",
    "q_image_dedup_clusters", "q_media_pipeline",
    // novelty audit of an empty corpus: no grams in any split → no
    // split rows (exact batch kernel AND the bounded theta drain —
    // zero batches leave no state, so the report frame is empty)
    "q_ngram_coverage", "q_stream_novelty_theta",
    // motifs over an empty stream: empty grid → no windows → no rows
    "q_sax_motifs",
    // jackknife of an empty corpus: no groups → no leave-out frame →
    // no estimate row (not a 0/0)
    "q_jackknife",
    // Bradley–Terry over an empty table: no matches → no participants
    // → no strength rows (not a 0/0 MM step)
    "q_bt_strength",
    // class balance of an empty table: a NULL target against zero
    // rows → no label rows
    "q_class_balance",
    // schema audit of an empty feed: no cells → no key rows (batch);
    // the streamed fold sees zero micro-batches → empty state → empty
    // report
    "q_schema_drift", "q_stream_schema_drift",
    // lang-id eval of an empty corpus: empty confusion grid → no rows
    "q_langid_eval",
    // embedding flagship on an empty table: empty corpus → zero
    // centroids → every stage frame empty → no verdicts
    "q_embedding_pipeline",
    // hubness of an empty table: no lists → no kNN graph → no hubs
    "q_ann_hubness",
    // dim audit of an empty table: no cells → no dim rows (batch);
    // the streamed fold's three empty slices fold to an empty grid
    "q_dim_audit", "q_stream_dim_audit",
    // streamed novelty of an empty corpus: empty gram set → no rows
    "q_stream_ngram_novelty",
    // incremental BM25 admission of an empty batch against an empty
    // index: no scored rows
    "q_bm25_incremental",
    // image gate of an empty corpus: no fixtures → no verdicts
    "q_image_gate",
    // MOSS pairing of an empty corpus: no fingerprints → no pairs
    "q_winnow_overlap",
    // radius sweep of an empty corpus: no pairs → no radius rows
    "q_hamming_curve",
    // zone maps of zero files: an empty audit, not a crash; the
    // streamed maintenance of an empty stream is an empty state
    "q_zonemap_prune", "q_stream_zonemap",
    // continuation leg: an empty corpus plants no excerpts and yields
    // no candidate pairs; an empty embedding table has no eval half to
    // classify; an empty trade graph has no nodes to label — all three
    // must collapse to empty frames through their joins and windows
    "q_containment_dedup", "q_knn_classify", "q_label_propagation",
    // Good–Turing over an empty corpus: no words → no frequency grid
    // → no per-source roll-up rows (not a division crash)
    "q_good_turing",
    // skew audit of empty tables: no keys → no count grid → no audit
    // rows (the constant-group collapse, not a NULL-row agg)
    "q_skew_audit",
    // conformal on an empty corpus: no calibration grid → no q̂ row →
    // the eval cross join is empty (not a NULL-quantile crash)
    "q_conformal",
    // bursts over an empty stream: no types × no days = empty grid
    "q_burst_detect",
    // temporal split of an empty stream: no bounds row → no cuts →
    // empty audit (both rollups are constant-group collapses)
    "q_temporal_split",
    // IPW over an empty stream: no strata rows, not a 0/0 ATE
    "q_ipw_ate",
    // negative sampling of an empty corpus: no vocab → no centers →
    // no probes (the interval join never sees a NULL total)
    "q_negative_sampling",
    // bandit scores over an empty corpus: no arms, no NULL-ln row
    "q_bandit_ucb",
    // Hill over empty tables: empty top sets → no estimator rows
    "q_tail_index",
    // W1 of an empty corpus: no sources × no grid = no rows
    "q_wasserstein",
    // the streamed burst monitor of an empty stream: empty drained
    // state → empty grid (the machinery still runs)
    "q_stream_burst",
    // cross-correlation of empty series: no days → no pairs → no lag
    // rows; MAD of an empty stream: no value grid → no type rows
    "q_cross_corr", "q_mad_anomaly",
    // cardinality audit of empty tables: NULL-sum legs filtered out;
    // DP release of an empty vocab: nothing to sample
    "q_join_card", "q_dp_topk",
    // resharding audit of an empty key set: both strategy rollups
    // collapse (constant-group), no 0/0 share
    "q_hash_ring",
    // SRM of an empty assignment log: no grain rows; DiD with any
    // empty cell (a fortiori an empty corpus): no estimate row
    "q_srm", "q_did",
    // histograms of empty columns: no value grid → no buckets
    "q_equi_depth_hist",
    // diversity of an empty corpus: no (source, lang) grid
    "q_simpson_diversity",
    // SAX of an empty stream: the empty burst grid symbolizes to
    // no words
    "q_sax_words",
    // entropy of an empty corpus: no (doc, char) grid
    "q_entropy_gate",
    // streamed SRM of an empty exposure log: both grain folds drain
    // to empty state → no grain rows
    "q_stream_srm",
    // r14 graph-ANN lifecycle on an empty corpus: no nodes → no
    // graph, no tombstones, no queries, no truth — every arm of the
    // delete/filtered A/Bs and the drained repair chain is empty
    "q_ann_delete", "q_ann_filtered", "q_stream_ann_delete")

  emptyTotal.foreach { name =>
    test(s"$name returns empty (not an exception) on empty tables") {
      val rows =
        try SparkEntry.queries(name)(spark, emptyDir).collect()
        finally TestSpark.housekeeping()
      assert(rows.isEmpty, s"expected empty, got ${rows.length} rows")
    }
  }

  test("q_ndcg reports zero DCG/IDCG and NULL ndcg per query on empty") {
    val rows =
      try SparkEntry.queries("q_ndcg")(spark, emptyDir).collect()
      finally TestSpark.housekeeping()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(r.getDouble(4) == 0.0d && r.getDouble(5) == 0.0d)
      assert(r.isNullAt(6), "ndcg undefined when IDCG = 0")
    }
  }

  test("q_retrieval_eval reports zero hits and a NULL first rank per query on empty") {
    val rows =
      try SparkEntry.queries("q_retrieval_eval")(spark, emptyDir).collect()
      finally TestSpark.housekeeping()
    assert(rows.length == 3, "one report row per fixed query, even with no corpus")
    rows.foreach { r =>
      assert(r.getLong(2) == 0L, "n_rel must be 0, not NULL")
      assert(r.isNullAt(3), "first_rel_rank undefined without relevant docs")
      assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
      assert(r.getDouble(6) == 0.0d, "precision@10 is 0/10, well-defined")
      assert(r.isNullAt(7), "recall undefined when n_rel = 0")
    }
  }

  // constant-output reports stay well-defined on empty inputs, like
  // any monitoring system reporting on an empty day
  test("q_funnel emits its stage skeleton with zero counts on empty") {
    val rows =
      try SparkEntry.queries("q_funnel")(spark, emptyDir).collect()
      finally TestSpark.housekeeping()
    assert(rows.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    rows.foreach(r => assert(r.getLong(2) == 0L))
  }

  test("q_label_vote is empty and q_label_kappa reports a zero-item row on empty") {
    val vote =
      try SparkEntry.queries("q_label_vote")(spark, emptyDir).collect()
      finally TestSpark.housekeeping()
    assert(vote.isEmpty)
    val kappa =
      try SparkEntry.queries("q_label_kappa")(spark, emptyDir).collect()
      finally TestSpark.housekeeping()
    // a monitor on an empty day reports "nothing to agree on", not a crash
    assert(kappa.length == 1)
    assert(kappa.head.getLong(0) == 0L, "n_items must be 0 on empty")
  }

  test("q_lsh_tuning emits the 3-config skeleton with zero counts on empty") {
    val rows =
      try SparkEntry.queries("q_lsh_tuning")(spark, emptyDir).collect()
      finally TestSpark.housekeeping()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((16L, 1L), (8L, 2L), (4L, 4L)))
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    }
  }

  test("q_auc reports a single null-metric row on empty (global agg, not a crash)") {
    val rows =
      try SparkEntry.queries("q_auc")(spark, emptyDir).collect()
      finally TestSpark.housekeeping()
    // a global aggregate always emits its one row; with no scores every
    // metric is NULL (the nullif guard keeps the 0·0 denominator from
    // turning into a division error)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.isNullAt(r.fieldIndex("auc")), "AUC must be NULL, not 0 or NaN")
  }

  test("q_dq_checks emits the five verdicts, vacuously passed, on empty") {
    val rows =
      try graft.operators.Extras.queries("q_dq_checks")(spark, emptyDir)
        .collect()
      finally TestSpark.housekeeping()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} not vacuously passed")
      assert(!r.getDouble(1).isNaN, s"${r.getString(0)} metric is NaN")
    }
  }
}
