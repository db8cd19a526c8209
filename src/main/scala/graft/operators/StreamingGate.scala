package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables
import graft.streaming.EventsStream

/** Structured Streaming under the DuckDB oracle gate.
  *
  * The streaming slice (SURVEY.md §2.9) was previously spec-only: the
  * batch/streaming parity proofs lived in StreamingSpec. These queries
  * run a REAL streaming query end-to-end inside a `queries()` entry —
  * replay source → transform → `Trigger.AvailableNow` drain → sink —
  * and return the drained sink as a DataFrame, so the driver's DuckDB
  * oracle hash-checks the streaming path exactly like any batch query.
  * This is the reference's operating mode (a cron-scheduled incremental
  * run, main.js:35-51): process everything available, persist, stop.
  *
  * Scale notes: all queries drain through `foreachBatch` into files —
  * never a driver-side memory sink — so the sink path is the one a
  * 1000-executor job would use (a transactional table MERGE replaces
  * the parquet swap at cluster scale). Watermarks bound streaming
  * state. These gate runs use throwaway checkpoints (each invocation
  * recomputes from scratch into a fresh per-query sink dir, deleted on
  * the next invocation); checkpointed INCREMENTAL reruns — AvailableNow
  * resuming from committed offsets — are exercised separately in
  * StreamingSpec's checkpoint-restart test.
  */
object StreamingGate extends graft.QueryPack {

  /** One sink dir per (query name, JVM), wiped at the START of each
    * invocation — repeated harness runs (verify at two SFs, bench
    * reps, specs) reuse one directory instead of leaking a drained
    * copy of the data per run. The pid component keeps CONCURRENT
    * processes (and other users of the shared tmpdir) from wiping each
    * other's sink mid-drain. Sibling dirs whose pid is no longer alive
    * are reaped here too — without that, every exited harness process
    * would strand a full drained copy of the events table in the
    * shared tmpdir until reboot. */
  private def freshDir(name: String): String = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val self = ProcessHandle.current().pid()
    def delete(f: java.io.File): Unit = graft.Fs.deleteRec(f)
    // reap graft_stream_* dirs left by processes that have exited
    // (dead pid, or an unparseable suffix from a foreign writer is
    // left alone); racing reapers are harmless — delete is idempotent
    // and a LIVE process can never be reaped.
    Option(tmp.listFiles()).foreach(_.foreach { f =>
      val nm = f.getName
      if (f.isDirectory && nm.startsWith("graft_stream_")) {
        val pid = nm.substring(nm.lastIndexOf('_') + 1).toLongOption
        val dead = pid.exists(p =>
          p != self && !ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false))
        if (dead) delete(f)
      }
    })
    val base = new java.io.File(tmp, s"graft_stream_${name}_$self")
    delete(base)
    base.mkdirs()
    base.toString
  }

  /** Run a streaming query to completion and read back its sink dir.
    *
    * State parallelism is pinned per drain via
    * `graft.stream.state.partitions` (default 8): every stateful
    * operator keeps one state store per shuffle partition (a
    * stream-stream join keeps FOUR — keyToNumValues +
    * keyWithIndexToValue per side) and every micro-batch pays a
    * per-store open/commit floor, so at the session's 32 partitions a
    * drain burns 32-128 store commits per trigger on filesystem fixed
    * cost alone (measured 11.3 s → 3.4 s on the join at identical
    * data). Physical planning reads the conf per micro-batch, so
    * setting it around .start() covers the whole drain — including
    * foreachBatch's batch-side shuffles, which are sized by the same
    * small-data argument. A checkpointed deployment must keep the
    * value constant for the checkpoint's life (state layout is
    * per-checkpoint; these gate drains are fresh-checkpoint runs) and
    * sizes it to executors × cores like any stateful job. Semantics
    * are partition-count-invariant — the oracles and the streaming
    * specs hold at any setting.
    *
    * Fixed-cost floor (r8 measurement): the residual ~0.7-2.4 s per
    * drain is the trigger lifecycle itself (stream planning, file
    * index, the data batch, the watermark-finalize batch, sink
    * read-back — 4-6 Spark jobs per drain), NOT storage. All three
    * candidate knobs were measured on the 4 slowest drains at sf0.1
    * and refuted: state partitions 8→4 gains ~5% (store open/commit
    * is already amortized at 8), the RocksDB provider is ~15% SLOWER
    * at these state sizes (native store open per batch dominates its
    * benefit), and tmpfs-backed checkpoint/state/sink dirs change
    * nothing (the page cache already absorbs the I/O). At deployment
    * scale the floor amortizes: it is per-trigger, not per-row. */
  private def drain(s: SparkSession, stream: DataFrame,
      mode: String)(sink: (DataFrame, Long) => Unit): Unit =
    drainImpl(s, stream, mode, None)(sink)

  /** [[drain]] with a PINNED checkpoint location, so a second drain of
    * the same stream RESUMES: committed batches are not re-read and
    * both source offsets and operator state pick up where the dead run
    * stopped — the restart-recovery path q_stream_restart gates. */
  private def drainFrom(s: SparkSession, stream: DataFrame,
      mode: String, ckpt: String)(sink: (DataFrame, Long) => Unit): Unit =
    drainImpl(s, stream, mode, Some(ckpt))(sink)

  private def drainImpl(s: SparkSession, stream: DataFrame,
      mode: String, ckpt: Option[String])(
      sink: (DataFrame, Long) => Unit): Unit = {
    val parts = sys.props.getOrElse("graft.stream.state.partitions", "8")
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      val w0 = stream.writeStream
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
      val q = ckpt.fold(w0)(c => w0.option("checkpointLocation", c))
        .foreachBatch(sink)
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** The q_stream_drift state fold: merge a micro-batch's (event_type,
    * bin) rows into the persistent count state by summation — the
    * mergeable count monoid, so the final state is independent of how
    * the stream was batched (asserted across batchings in
    * StatefulStreamingSpec). State stays grid-sized (types × bins)
    * at any stream length; the staged-swap tail is the single-writer
    * harness convention the other streaming sinks share. */
  /** Read a parquet state dir renamed to the caller's output column
    * names, or the schema-correct empty frame when the stream never
    * delivered a batch (empty-input totality: a monitor on an empty
    * day reports nothing, it does not throw). `cols` maps the stored
    * column name to (output name, output type); the one definition
    * serves every parquet-state reader so the empty-state schema
    * cannot drift from the read path. */
  private def readStateOr(s: SparkSession, state: String,
      cols: Seq[(String, String, org.apache.spark.sql.types.DataType)])
      : DataFrame = {
    recoverState(state)
    if (new java.io.File(state).exists())
      s.read.parquet(state)
        .select(cols.map { case (from, to, _) => col(from).as(to) }: _*)
    else s.createDataFrame(new java.util.ArrayList[Row](),
      org.apache.spark.sql.types.StructType(cols.map { case (_, to, t) =>
        org.apache.spark.sql.types.StructField(to, t) }))
  }

  private def readBinState(s: SparkSession, state: String,
      binName: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    readStateOr(s, state, Seq(
      ("event_type", "event_type", StringType),
      ("bin", binName, LongType),
      ("n", "n", LongType)))
  }

  /** The q_stream_freshness state fold: merge a micro-batch's
    * (event_type, us) rows into per-type (last_us, n_events) state —
    * a (MAX, SUM) monoid, the second member of the mergeable-state
    * family next to foldBinCounts' counts. State is |types|-sized at
    * any stream length and the fold is batching-invariant (max and
    * sum are associative/commutative — asserted in
    * StatefulStreamingSpec). */
  /** The q_stream_seq_pack state fold — the first ORDER-DEPENDENT
    * member of the fold family (every prior fold is a commutative
    * monoid; packing is not: a doc's sequence assignment depends on
    * every token that arrived before it). State per source:
    * `cum_tok` (tokens packed so far — the pack cursor) plus the ONE
    * open sequence's partial aggregates (oseq_id = -1 sentinel when
    * the cursor sits exactly on a boundary). Each batch packs its
    * slice OFFSET by the carried cursor through the shared
    * Extras.seqPackAgg kernel, merges the carried open partials into
    * the matching seq row (every partial column is a monoid — the
    * kernel's design contract), EMITS the sequences the batch closed
    * into the batchId-keyed overwrite sink, and carries the new open
    * tail. State is |sources|-sized forever; emitted ∪ final flush ≡
    * the batch q_seq_pack given in-order arrival (which the staged
    * doc-id-RANGE slices guarantee — the % 3 slicing of the other
    * drains would scramble the pack order). */
  def foldSeqPack(state: String, out: String)(
      batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val s = batch.sparkSession
    val CTX = Extras.PACK_CTX
    val toks = Extras.seqPackToks(batch)
    val prior =
      if (new java.io.File(state).exists()) Some(s.read.parquet(state))
      else None
    val off = prior.map(_.select(col("source"), col("cum_tok").as("off")))
      .getOrElse(toks.limit(0).select(col("source"), col("tok").as("off")))
    val aggB = Extras.seqPackAgg(toks, off)
    val openRows = prior.map(_.filter(col("oseq_id") >= 0L)
        .select(col("source"), col("oseq_id").as("seq_id"),
          col("o_n_docs").as("n_docs"),
          col("o_n_doc_starts").as("n_doc_starts"),
          col("o_first_doc").as("first_doc"),
          col("o_last_doc").as("last_doc"),
          col("o_n_tokens").as("n_tokens")))
      .getOrElse(aggB.limit(0))
    val merged = aggB.unionByName(openRows)
      .groupBy(col("source"), col("seq_id"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_doc_starts")).as("n_doc_starts"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"),
        sum(col("n_tokens")).as("n_tokens"))
      .localCheckpoint()
    import org.apache.spark.sql.expressions.Window
    val wS = Window.partitionBy(col("source")).orderBy(col("seq_id").desc)
    val marked = merged
      .withColumn("rk", row_number().over(wS))
      .withColumn("open", col("rk") === 1 && col("n_tokens") < CTX)
    marked.filter(!col("open"))
      .select(col("source"), col("seq_id"), col("n_docs"),
        col("n_doc_starts"), col("first_doc"), col("last_doc"),
        col("n_tokens"))
      .write.mode("overwrite").parquet(s"$out/b$id")
    val btok = toks.groupBy(col("source")).agg(sum(col("tok")).as("btok"))
    val cumPrior = prior.map(_.select(col("source"), col("cum_tok")))
      .getOrElse(btok.limit(0).select(col("source"),
        col("btok").as("cum_tok")))
    val cumNew = cumPrior.join(btok, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("cum_tok"), lit(0L)) +
          coalesce(col("btok"), lit(0L))).as("cum_tok"))
    val newState = cumNew
      .join(marked.filter(col("open"))
        .select(col("source"), col("seq_id").as("oseq_id"),
          col("n_docs").as("o_n_docs"),
          col("n_doc_starts").as("o_n_doc_starts"),
          col("first_doc").as("o_first_doc"),
          col("last_doc").as("o_last_doc"),
          col("n_tokens").as("o_n_tokens")),
        Seq("source"), "left_outer")
      .select(col("source"), col("cum_tok"),
        coalesce(col("oseq_id"), lit(-1L)).as("oseq_id"),
        coalesce(col("o_n_docs"), lit(0L)).as("o_n_docs"),
        coalesce(col("o_n_doc_starts"), lit(0L)).as("o_n_doc_starts"),
        coalesce(col("o_first_doc"), lit(-1L)).as("o_first_doc"),
        coalesce(col("o_last_doc"), lit(-1L)).as("o_last_doc"),
        coalesce(col("o_n_tokens"), lit(0L)).as("o_n_tokens"))
    swapState(newState, state)
  }

  /** Crash-safe state swap shared by the parquet-state folds: write
    * the merged frame to `state_tmp`, rename the prior state ASIDE
    * (`state_old`) rather than deleting it, rename tmp into place,
    * and only then drop the aside copy. Any failure mid-sequence —
    * a crash between steps, or a renameTo returning false (e.g.
    * across filesystems) — leaves a recoverable copy, and
    * [[recoverState]] (run before every state READ as well as at the
    * top of the swap) renames that copy back into place, so a crash
    * between the aside-rename and the tmp-rename resumes from the
    * prior state instead of silently restarting from the batch alone.
    * The previous delete-before-rename variant lost all monitor state
    * on that window. A leftover `state_old` from a crash AFTER a
    * successful swap is stale-by-one; recovery prefers the live state
    * dir (old is only restored when state itself is missing) and the
    * next successful swap clears it. */
  private[graft] def swapState(merged: DataFrame, state: String): Unit = {
    recoverState(state)
    val dir = new java.io.File(state)
    val tmp = new java.io.File(state + "_tmp")
    val old = new java.io.File(state + "_old")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    if (old.exists()) graft.Fs.deleteRec(old)
    if (dir.exists())
      require(dir.renameTo(old), s"state swap failed: $state -> $old")
    require(tmp.renameTo(dir), s"state swap failed: $tmp -> $state")
    if (old.exists()) graft.Fs.deleteRec(old)
  }

  /** The swap's crash-recovery prologue: if the state dir is missing
    * but the aside copy exists, the process died inside swapState's
    * two-rename window — rename the aside back into place before any
    * read or re-swap. Idempotent and cheap (two existence probes) so
    * every reader calls it unconditionally. */
  private[graft] def recoverState(state: String): Unit = {
    val dir = new java.io.File(state)
    val old = new java.io.File(state + "_old")
    if (!dir.exists() && old.exists())
      require(old.renameTo(dir), s"state recovery failed: $old -> $state")
  }

  /** The q_stream_quantile state fold: merge a micro-batch's `cents`
    * column into one persistent (KLL sketch, count) row — the third
    * mergeable-summary fold next to the count/max monoids and the MG
    * sketch. A batch with no rows contributes a NULL sketch, which the
    * merge agg's FILTER clause skips — scoped to the sketch column only,
    * so the row count keeps summing even when every sketch so far is
    * NULL (a row-level filter here would empty the agg input and turn
    * `n` NULL, miscounting an all-empty-batch history). */
  private[graft] def foldKll(state: String, k: Int)(
      batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val bsk = batch.agg(
      expr(s"kll_sketch_agg_bigint(cents, $k)").as("sk"),
      count(lit(1)).as("n"))
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        prior.unionByName(bsk).agg(
          expr(s"kll_merge_agg_bigint(sk, $k) FILTER (WHERE sk IS NOT NULL)")
            .as("sk"),
          sum(col("n")).as("n"))
      } else bsk
    swapState(merged, state)
  }

  /** [[foldKll]] made idempotent under micro-batch REPLAY: the state
    * row carries the last merged batch id, and a batch whose id is
    * ≤ last_id is skipped instead of re-merged. This is the missing
    * half of crash safety for merged-sketch state: swapState protects
    * the rename window, but a death AFTER the swap and BEFORE the
    * checkpoint commit makes the restarted stream re-deliver the same
    * batch — and a sketch merge, unlike the batchId-keyed overwrite
    * sink of q_stream_restart, is NOT naturally idempotent (the
    * double-fold would double-count every row of the batch). The
    * last_id probe is a 1-row driver read of the 1-row state — the
    * fixpoint-probe budget. Batch ids from a pinned checkpoint are
    * strictly increasing, so one high-water id suffices. */
  private[graft] def foldKllIdem(state: String, k: Int)(
      batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val exists = new java.io.File(state).exists()
    // Read the 1-row state ONCE: the same localCheckpointed frame
    // serves both the last_id high-water probe and the union-merge
    // prior (the probe collect materializes it), instead of two
    // parquet reads per batch.
    val prior: Option[DataFrame] =
      if (exists)
        Some(batch.sparkSession.read.parquet(state).localCheckpoint())
      else None
    val replayed = prior.exists { p =>
      p.agg(max(col("last_id"))).collect()(0).getLong(0) >= id
    }
    if (!replayed) {
      val bsk = batch.agg(
        expr(s"kll_sketch_agg_bigint(cents, $k)").as("sk"),
        count(lit(1)).as("n"))
        .withColumn("last_id", lit(id))
      val merged = prior match {
        case Some(p) =>
          p.unionByName(bsk).agg(
            expr(
              s"kll_merge_agg_bigint(sk, $k) FILTER (WHERE sk IS NOT NULL)")
              .as("sk"),
            sum(col("n")).as("n"), max(col("last_id")).as("last_id"))
        case None => bsk
      }
      swapState(merged, state)
    }
  }

  /** The q_stream_hll state fold: merge a micro-batch's HLL sketch of
    * user_id into ONE persistent (sketch, count) row — the fourth
    * mergeable-summary fold next to KLL, Misra-Gries and the count/max
    * monoids, and the cardinality member of the family: distinct-user
    * state is O(2^lgK) bytes at any stream length where an exact
    * streaming distinct (q_stream_srm's units grain) holds
    * user-universe-bounded rows. HLL register-max merges are
    * associative/commutative, so the fold is batching-invariant; the
    * NULL-sketch FILTER scoping is foldKll's (empty batches keep n
    * summing). */
  private[graft] def foldHll(state: String, lgK: Int)(
      batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val bsk = batch.agg(
      expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"),
      count(lit(1)).as("n"))
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        prior.unionByName(bsk).agg(
          expr(s"hll_union_agg(sk, false) FILTER (WHERE sk IS NOT NULL)")
            .as("sk"),
          sum(col("n")).as("n"))
      } else bsk
    swapState(merged, state)
  }

  def foldTypeMax(state: String)(batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val bc = batch.groupBy(col("event_type"))
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("n"))
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        prior.unionByName(bc)
          .groupBy(col("event_type"))
          .agg(max(col("last_us")).as("last_us"), sum(col("n")).as("n"))
      } else bc
    swapState(merged, state)
  }

  /** The q_stream_zonemap state fold: merge a micro-batch's z-cell
    * rows into persistent per-cell zone maps — a (MIN, MAX, SUM)
    * monoid, the lakehouse-metadata member of the mergeable-state
    * family: exactly how table-format file statistics accrete as data
    * commits. State is cell-count-sized (≤4096 rows — the 12-bit
    * cell space) at any stream length; batching-invariant because min/max/sum are associative;
    * writes ride the crash-safe swap. */
  def foldZoneMap(state: String)(batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val bc = batch.groupBy(col("zcell"))
      .agg(min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"),
        count(lit(1)).as("n_rows"))
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        prior.unionByName(bc)
          .groupBy(col("zcell"))
          .agg(min(col("min_a")).as("min_a"), max(col("max_a")).as("max_a"),
            min(col("min_b")).as("min_b"), max(col("max_b")).as("max_b"),
            sum(col("n_rows")).as("n_rows"))
      } else bc
    swapState(merged, state)
  }

  /** Stage one parquet file of a replayed multi-batch source: write
    * `df` as a single part file under `src/name.parquet` with a pinned
    * mtime (file order = arrival order under maxFilesPerTrigger=1).
    * Shared by the restart gates and the sliced-replay drains. */
  private def stageFile(root: String, src: java.io.File,
      df: DataFrame, name: String, mtime: Long): Unit = {
    val tmp = new java.io.File(root, "tmp_" + name)
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file for $name"))
    val dst = new java.io.File(src, name + ".parquet")
    require(part.renameTo(dst), s"stage $name failed")
    dst.setLastModified(mtime)
    graft.Fs.deleteRec(tmp)
  }

  /** The q_stream_ngram_novelty state fold: accrete a micro-batch's
    * distinct (split, trigram) cells into the persistent distinct set
    * — set union IS the monoid, so the fold is batching-invariant by
    * construction. State is DISTINCT-GRAM-sized (the exact-streaming-
    * distinct posture of q_stream_srm's units grain: exact novelty
    * accounting requires remembering what was seen; the O(sketch)
    * alternative is an HLL per split, which prices totals but cannot
    * answer per-gram membership). */
  def foldGramSet(state: String)(batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val bg = Dedup.gramSplits(batch)
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        prior.unionByName(bg).distinct()
      } else bg
    swapState(merged, state)
  }

  /** The q_stream_novelty_theta state fold — [[foldGramSet]]'s BOUNDED
    * twin: instead of the exact distinct-gram set (the one drain state
    * that grows with data), each batch's per-split gram THETA sketch
    * unions into one persistent (split, sk, n_docs) row per split —
    * O(2^lgK) bytes per split forever. Theta retains the k smallest
    * gram hashes, a pure function of the accumulated gram SET, so the
    * fold is batching-invariant in ESTIMATES too (not just bounds);
    * cross-batch re-arrivals of a gram are absorbed by the sketch's
    * distinct semantics. n_docs sums per split — the row-conservation
    * probe (foldHll's `n` discipline). NULL-sketch FILTER keeps
    * doc-only splits (all texts too short for a trigram) merging. */
  def foldGramTheta(state: String, lgK: Int)(
      batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val bsk = Dedup.gramSplits(batch)
      .groupBy(col("split"))
      .agg(expr(s"theta_sketch_agg(g, $lgK)").as("sk"))
    val dc = batch.select(Dedup.splitCol.as("split"))
      .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
    val bstate = dc.join(bsk, Seq("split"), "left_outer")
      .select(col("split"), col("sk"), col("n_docs"))
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        prior.unionByName(bstate)
          .groupBy(col("split"))
          .agg(
            expr(s"theta_union_agg(sk, $lgK) FILTER (WHERE sk IS NOT NULL)")
              .as("sk"),
            sum(col("n_docs")).as("n_docs"))
      } else bstate
    swapState(merged, state)
  }

  /** The q_stream_bm25_admission state fold: each arriving document
    * slice tokenizes through the SAME bm25 kernel
    * (TextAnalytics.bm25DocsFrom) and its 1-row stats vector
    * (nd, Σdl, per-term df — EXACT LONGS) adds component-wise into
    * the persistent index stats — the posting-list-statistics merge a
    * search index performs at segment commit, run as a streaming
    * fold. A pure sum monoid over longs: batching-invariant by
    * construction, O(1 row) state forever. Empty slices coalesce
    * their NULL sums to 0 (the q_bm25_incremental totality
    * discipline) so they merge as the additive identity. */
  def foldBm25Stats(state: String, terms: Seq[String])(
      batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val raw = TextAnalytics.bm25Stats(
      TextAnalytics.bm25DocsFrom(batch), terms)
    val bs = raw.select(
      col("nd") +: coalesce(col("sdl"), lit(0L)).as("sdl") +:
        terms.map(t => coalesce(col(s"dfl_$t"), lit(0L)).as(s"dfl_$t")): _*)
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        val aggs = sum(col("sdl")).as("sdl") +:
          terms.map(t => sum(col(s"dfl_$t")).as(s"dfl_$t"))
        prior.unionByName(bs).agg(sum(col("nd")).as("nd"), aggs: _*)
      } else bs
    swapState(merged, state)
  }

  /** The q_stream_dim_audit state fold: merge a micro-batch's per-dim
    * (n, Σs, Σs²) moments into the persistent 64-row grid by addition
    * — the moments are a sum monoid (Similarity.dimMoments), so the
    * fold is batching-invariant and the drained grid feeds the same
    * dimReport as the batch audit. DECIMAL(38,0) state columns keep
    * the squared sums exact at any stream length. */
  def foldDimMoments(state: String)(batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    import org.apache.spark.sql.types.DecimalType
    val bc = Similarity.dimMoments(Similarity.dimCells(batch))
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        prior.unionByName(bc)
          .groupBy(col("dim"))
          .agg(sum(col("n")).as("n"),
            sum(col("s1")).cast(DecimalType(38, 0)).as("s1"),
            sum(col("s2")).cast(DecimalType(38, 0)).as("s2"))
      } else bc
    swapState(merged, state)
  }

  /** The q_stream_schema_drift state fold: merge a micro-batch's
    * (key, jtype) cells into persistent per-cell counts — the same
    * count monoid as foldBinCounts on the schema-audit grid (keys ×
    * type classes ≤ a few dozen rows at any stream length). */
  def foldSchemaCells(state: String)(batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val bc = batch.groupBy(col("key"), col("jtype"))
      .agg(count(lit(1)).as("n"))
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        prior.unionByName(bc)
          .groupBy(col("key"), col("jtype"))
          .agg(sum(col("n")).as("n"))
      } else bc
    swapState(merged, state)
  }

  def foldBinCounts(state: String)(batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val bc = batch.groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = batch.sparkSession.read.parquet(state)
        prior.unionByName(bc)
          .groupBy(col("event_type"), col("bin"))
          .agg(sum(col("n")).as("n"))
      } else bc
    swapState(merged, state)
  }

  /** The q_stream_media_gate state fold: each arriving document slice
    * generates its media (sources + retouched copies, with the
    * q_image_gate truncation plant keyed on the IMAGE id), REALLY
    * decodes it (Multimodal.imageInfo — the one-decode kernel), and
    * folds the per-verdict counts into the persistent 3-row grid by
    * summation — the count monoid, batching-invariant, O(verdicts)
    * state forever. The decode runs INSIDE the fold: this is the
    * drain where executor-side binary work crosses the streaming
    * boundary, not just row arithmetic. */
  def foldMediaGate(state: String)(batch: DataFrame, id: Long): Unit = {
    recoverState(state)
    val s = batch.sparkSession
    import s.implicits._
    val bc = batch.select(col("doc_id")).as[Long]
      .mapPartitions(_.grouped(64).flatMap(_.flatMap { d =>
        def gated(imgId: Long, png: Array[Byte]) =
          Multimodal.imageInfo(imgId,
            if (imgId % 29 == 5) png.take(10) else png)
        val rows = scala.collection.mutable.ArrayBuffer(
          gated(d, Multimodal.genPng(d)))
        if (d % 17 == 4)
          rows += gated(d + 1000000L, Multimodal.genPngNearDup(d))
        rows
      }))
      .toDF()
      .select(when(col("width") === 0L, "undecodable")
        .when(least(col("width"), col("height")) < 10L, "too_small")
        .otherwise("ok").as("reason"))
      .groupBy(col("reason")).agg(count(lit(1)).as("n"))
    val merged =
      if (new java.io.File(state).exists()) {
        val prior = s.read.parquet(state)
        prior.unionByName(bc)
          .groupBy(col("reason")).agg(sum(col("n")).as("n"))
      } else bc
    swapState(merged, state)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // STREAMING MEDIA GATE — the TWENTY-SEVENTH oracle-gated drain and
    // the multimodal member of the drain family: document slices
    // arrive, each batch's images are generated and REALLY decoded
    // executor-side inside the fold ([[foldMediaGate]] — binary work
    // crossing the streaming boundary, not just row arithmetic), and
    // the per-verdict counts accrete into a 3-row count-monoid grid.
    // This is how an ingestion pipeline watches decode health live (a
    // codec regression or a corrupted upstream batch shows as an
    // undecodable spike) without rescanning the media store. The
    // oracle is fully analytic — the truncation plant from the image
    // key, the dims from the fixture formula over sources ∪ copies —
    // so a decode that disagrees with the contract fails the hash,
    // exactly q_image_gate's discipline at the aggregate grain.
    "q_stream_media_gate" -> ((s, d) => {
      val root = freshDir("q_stream_media_gate")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val state = root + "/mg"
      val docs = Tables(s, d, "documents").select(col("doc_id"))
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 0), "f1", t0)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 1), "f2",
        t0 + 2000)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 2), "f3",
        t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append")(foldMediaGate(state))
      recoverState(state)
      import org.apache.spark.sql.types.{LongType, StringType}
      readStateOr(s, state, Seq(
        ("reason", "reason", StringType), ("n", "n", LongType)))
        .orderBy(col("reason"))
    }),

    // Stream-STATIC dim enrichment — the remaining streaming join
    // surface (stream-stream is q_stream_join): every micro-batch
    // broadcast-joins the static profiled-customer slice (left outer,
    // so unprofiled users flow through as UNKNOWN — both paths
    // non-vacuous on testdata), stateless per-trigger, no watermark
    // needed. The drained append output must hash-equal the identical
    // batch join — THE batch/streaming parity contract for dim
    // enrichment. At 100 TB the dim is the broadcast side by
    // construction (a profiled-slice lookup), re-read per restart,
    // never stream state.
    "q_stream_enrich" -> ((s, d) => {
      val out = freshDir("q_stream_enrich") + "/enr"
      val dim = Tables(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_mktsegment"))
      val enriched = EventsStream.replay(s, d)
        .join(broadcast(dim), col("user_id") === col("c_custkey"),
          "left_outer")
        .select(col("event_id"), col("user_id"),
          coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      drain(s, enriched, "append") { (batch, _) =>
        batch.write.mode("append").parquet(out)
      }
      s.read.parquet(out).orderBy(col("event_id"))
    }),

    // ST1/ST4 + A1 shape: event-time tumbling-window aggregation run AS
    // A STREAM (replay source, 2h watermark, complete mode) — the
    // streaming twin of q_window_time, now hash-checked against the same
    // oracle. foreachBatch overwrites the full result per micro-batch
    // (complete mode = the whole agg state), so the final files ARE the
    // drained aggregate.
    "q_stream_window" -> ((s, d) => {
      val out = freshDir("q_stream_window") + "/win"
      drain(s, EventsStream.windowedAgg(EventsStream.replay(s, d)),
        "complete") { (batch, _) =>
        batch.write.mode("overwrite").parquet(out)
      }
      s.read.parquet(out).orderBy(col("window_start_us"), col("event_type"))
    }),

    // ST5/K1/J8: the reference's whole incremental loop — scrape batch →
    // existence probe → upsert (posts-from-hashtags.js:358-379 sink side)
    // — as a streaming foreachBatch MERGE keyed by user_id keeping the
    // latest event. Each micro-batch reduces to one row per key (window
    // rank inside the batch — allowed there, it's a plain DataFrame),
    // then CONDITIONALLY merges into the parquet target keeping the
    // max-(ts, event_id) row per key — correct under ANY micro-batch
    // arrival order (a blind last-writer merge would let a late batch
    // carrying older events clobber newer target rows). The target is
    // BUCKET-PARTITIONED by a stable key hash and each trigger rewrites
    // only the buckets the batch touches (partition-pruned read +
    // per-bucket swap) — O(|batch| + touched/numBuckets · target) per
    // trigger, not the O(target) full rewrite the r5 design paid; see
    // mergeLatestIntoBucketedParquet and MergePruneSpec. The drained
    // target must equal the batch latest-per-key query, which is
    // exactly what the oracle asserts.
    "q_stream_upsert" -> ((s, d) => {
      val target = freshDir("q_stream_upsert") + "/t"
      val events = EventsStream.replay(s, d)
        .withWatermark("ts", "2 hours")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
      drain(s, events, "append") { (batch, batchId) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val latest = batch.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1).drop("rk")
        EventsStream.mergeLatestIntoBucketedParquet(s, target,
          "user_id", "ts_us", "event_id")(latest, batchId)
      }
      s.read.parquet(target)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // ST5/F5 under the oracle gate: STATEFUL STREAMING DEDUP. The
    // replay stream is unioned with a copy of its every-7th event (so
    // the dedup state does real work), then deduplicated by event_id
    // with dropDuplicatesWithinWatermark — the bounded-state variant
    // (state for an id is dropped once the watermark passes its event
    // time; plain dropDuplicates grows state forever, a leak at
    // 100 TB). Injected duplicates carry identical event times, so
    // within-watermark dedup is EXACT here and the drained sink must
    // equal the batch distinct — which is just the events table.
    // EXACTNESS also leans on the replay being ONE micro-batch
    // (pathGlobFilter events.parquet + maxFilesPerTrigger=1): were the
    // table split across files, duplicates/late base rows arriving in
    // later batches could fall behind the advanced watermark and be
    // dropped. The drain counts non-empty micro-batches and fails
    // loudly if a future multi-file testdata layout breaks the
    // assumption, instead of silently failing the oracle.
    "q_stream_dedup" -> ((s, d) => {
      val out = freshDir("q_stream_dedup") + "/dedup"
      val base = EventsStream.replay(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val withDups = base.unionByName(base.filter(col("event_id") % 7 === 0))
      val deduped = withDups
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
      val nonEmptyBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      drain(s, deduped, "append") { (batch, _) =>
        val persisted = batch.persist()
        if (persisted.count() > 0) nonEmptyBatches.incrementAndGet()
        persisted.write.mode("append").parquet(out)
        persisted.unpersist(false)
        ()
      }
      require(nonEmptyBatches.get() == 1,
        s"q_stream_dedup expects a single-file replay (one micro-batch); " +
          s"saw ${nonEmptyBatches.get()} non-empty batches — watermark-exact " +
          "dedup is no longer guaranteed under this data layout")
      s.read.parquet(out)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // RESTART RECOVERY under the oracle — the 100 TB operational case
    // every other drain skips (they are single-run AvailableNow): a
    // stream DIES mid-drain (a planted failure in the sink after batch
    // 1's partial output is on disk) and a second drain resumes from
    // the SAME checkpoint. The gate proves the full recovery contract:
    //   - source offsets: committed batch 0 is never re-read,
    //   - operator state: dropDuplicates state from batch 0 survives,
    //     so cross-file duplicates arriving after the crash are still
    //     dropped (state loss would re-admit them → hash fail),
    //   - sink idempotence: the uncommitted batch 1 re-runs and
    //     OVERWRITES its own partial batchId-keyed output — the
    //     standard exactly-once foreachBatch pattern.
    // The replay is the events table split into 3 files with planted
    // CROSS-FILE duplicates (f2 repeats f1's %4 slice, f3 repeats
    // f2's %8 slice), maxFilesPerTrigger=1 → 3 micro-batches; the
    // drained union must equal the plain batch events table. Exact-
    // copy duplicates make the kept-row identity order-invariant, so
    // file arrival order cannot matter. dropDuplicates (no watermark)
    // is deliberate: eviction must not race the crash window in a
    // correctness gate; a deployment bounds the same state with
    // dropDuplicatesWithinWatermark (q_stream_dedup's form).
    "q_stream_restart" -> ((s, d) => {
      val root = freshDir("q_stream_restart")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val out = root + "/out"
      val ckpt = root + "/ckpt"
      val marker = new java.io.File(root, "killed")
      val ev = Tables(s, d, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      def writeFile(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = new java.io.File(root, "tmp_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file for $name"))
        val dst = new java.io.File(src, name + ".parquet")
        require(part.renameTo(dst), s"stage $name failed")
        dst.setLastModified(mtime)
        graft.Fs.deleteRec(tmp)
      }
      val t0 = System.currentTimeMillis() - 60000
      writeFile(ev.filter(col("event_id") % 2 === 0), "f1", t0)
      writeFile(ev.filter(col("event_id") % 2 === 1)
        .unionByName(ev.filter(col("event_id") % 4 === 0)), "f2", t0 + 2000)
      writeFile(ev.filter(col("event_id") % 8 === 1), "f3", t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      def stream() = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
        .dropDuplicates("event_id")
      def sink(dieAtBatch1: Boolean): (DataFrame, Long) => Unit =
        (batch, id) => {
          // batchId-keyed overwrite = idempotent under re-runs
          batch.write.mode("overwrite").parquet(s"$out/b$id")
          if (dieAtBatch1 && id == 1 && marker.createNewFile())
            sys.error("planted mid-drain failure (restart-recovery gate)")
        }
      val died =
        try { drainFrom(s, stream(), "append", ckpt)(sink(true)); false }
        catch {
          case _: org.apache.spark.sql.streaming.StreamingQueryException =>
            true
        }
      require(died && marker.exists(),
        "q_stream_restart: the first drain must die on batch 1 — " +
          "the replay no longer produces multiple micro-batches")
      drainFrom(s, stream(), "append", ckpt)(sink(false))
      s.read.parquet(out + "/b*")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // ST5 generalized: CUSTOM keyed state under the oracle gate. The
    // flatMapGroupsWithState sessionizer (gap = 30 min; the state a
    // RocksDB store holds per key at scale) runs as a real stream; its
    // drained per-event session assignments re-aggregate to exactly
    // the batch window-function q_sessionize result — same oracle SQL.
    // ORDERING CONTRACT: the imperative fold requires each key's
    // events to arrive in event-time order ACROSS micro-batches (true
    // for the single-file replay; sorted within a batch by the group
    // iterator). An out-of-order backfill batch would corrupt session
    // boundaries — the order-robust formulation is the watermark-based
    // native session_window twin (q_session_window / StreamingSpec),
    // which buffers and merges late events instead of folding eagerly.
    // Ties at equal ts cannot split a session (gap 0 ≤ 30 min), so the
    // imperative per-group fold and the declarative running sum agree
    // on every session boundary by construction.
    "q_stream_sessions" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      val out = freshDir("q_stream_sessions") + "/sess"
      val events = EventsStream.replay(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .as[EventsStream.SessionEvent]
      val assigned = events.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
          EventsStream.sessionizeGroup)
      drain(s, assigned.toDF(), "append") { (batch, _) =>
        batch.write.mode("append").parquet(out)
      }
      s.read.parquet(out)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // STREAM-STREAM event-time interval join under the oracle gate —
    // the attribution join (purchase within the hour after a view, per
    // user), the one Structured Streaming join surface the other five
    // queries don't touch. Two independent replay sources, a watermark
    // on EACH side, and a range predicate tying the two event times:
    // from these Spark derives per-side state watermarks, so each
    // side's join state holds only rows inside
    // watermark + interval — bounded state at any stream length (an
    // unconstrained stream-stream join would buffer both streams
    // forever, the 100 TB non-starter; StreamJoinSpec drives the
    // multi-batch MemoryStream path where late rows age out). Inner
    // append-mode joins emit on match, so the AvailableNow drain's
    // files are the complete join — which must equal the batch
    // self-join the oracle states.
    // Heaviest state layout of the six drains: four stores per
    // partition (see drain's state-parallelism note — this query is
    // why the pin exists).
    "q_stream_join" -> ((s, d) => {
      val out = freshDir("q_stream_join") + "/attr"
      val views = EventsStream.replay(s, d)
        .filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("vts"))
        .withWatermark("vts", "2 hours")
      val buys = EventsStream.replay(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id").as("buser"),
          col("ts").as("bts"))
        .withWatermark("bts", "2 hours")
      val joined = views.join(buys,
        expr("user_id = buser AND bts BETWEEN vts AND vts + INTERVAL 1 HOUR"))
        .select(col("view_id"), col("buy_id"), col("user_id"),
          unix_micros(col("vts")).as("vts_us"),
          unix_micros(col("bts")).as("bts_us"))
      drain(s, joined, "append") { (batch, _) =>
        batch.write.mode("append").parquet(out)
      }
      s.read.parquet(out).orderBy(col("view_id"), col("buy_id"))
    }),

    // CONTINUOUS heavy-hitter monitoring: the Misra–Gries summary as
    // STREAMING STATE. Each micro-batch reduces to one k-counter
    // summary via the native aggregate (the only thing that crosses
    // the shuffle), and the sink folds it into persistent sketch state
    // with the mergeable-summaries merge — O(k log k) driver work per
    // trigger regardless of stream size, and the N/(k+1) bound holds
    // over the WHOLE stream because MG summaries merge associatively
    // under any batch arrival order (StatefulStreamingSpec drives the
    // multi-batch path; this drain is one batch under the oracle, the
    // q_stream_dedup precedent). The emitted result is the guarantee
    // booleans against the exact top-2 of the same skewed event_id
    // stream q_sketch_topk uses on doc_id — the oracle pins them
    // constant-true.
    "q_stream_topk" -> ((s, d) => {
      val K = 8
      val state = freshDir("q_stream_topk") + "/sk"
      val item = when(col("event_id") % 4 < 2,
          concat(lit("hot_"), (col("event_id") % 2).cast("string")))
        .when(col("event_id") % 4 === 2,
          concat(lit("mid_"), (col("event_id") % 16).cast("string")))
        .otherwise(concat(lit("cold_"), col("event_id").cast("string")))
      val stream = EventsStream.replay(s, d).select(item.as("item"))
      drain(s, stream, "append") { (batch, _) =>
        val r = batch.agg(
          graft.functions.MisraGries.mgTopK(col("item"), K).as("sk"),
          count(col("item")).as("bn")).collect()(0)
        val bsk = r.getSeq[org.apache.spark.sql.Row](0)
          .map(x => x.getString(0) -> x.getLong(1))
        val bn = r.getLong(1)
        recoverState(state)
        val (prior, pn) =
          if (new java.io.File(state).exists()) {
            val st = batch.sparkSession.read.parquet(state).collect()
            (st.map(x => x.getString(0) -> x.getLong(1)).toSeq,
              if (st.isEmpty) 0L else st(0).getLong(2))
          } else (Seq.empty[(String, Long)], 0L)
        val merged =
          graft.functions.MisraGries.mergeSummaries(prior, bsk, K)
        val n = pn + bn
        val ss = batch.sparkSession
        import ss.implicits._
        // state = k rows + the stream mass; swapped in via the same
        // crash-safe rename-aside tail the monitor folds use — a crash
        // between any two steps leaves either the prior state or a
        // recoverable aside, never an empty dir (r9: this was the one
        // writer still on the delete-before-rename pattern)
        swapState(merged.map { case (w, c) => (w, c, n) }
          .toDF("item", "est", "n"), state)
      }
      recoverState(state)
      val st = s.read.parquet(state)
        .select(col("item"), col("est"), col("n"))
      val exact = Tables(s, d, "events").select(item.as("item"))
        .groupBy(col("item")).agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("item")).limit(2)
      exact.join(st, Seq("item"), "left_outer")
        .select(col("item"), col("exact_cnt"),
          (col("est").isNotNull && col("est") <= col("exact_cnt") &&
            (col("exact_cnt") - col("est")).cast("double") <=
              lit(2.0) * col("n").cast("double") / (K + 1)).as("within_bound"))
        .orderBy(col("item"))
    }),

    // Streaming quantile monitor — the FOURTEENTH oracle-gated
    // streaming query and the second sketch-state fold next to
    // q_stream_topk's Misra-Gries: per micro-batch, the batch's KLL
    // sketch (Spark 4 native kll_* over the bundled DataSketches)
    // merges into ONE persistent sketch row — state is O(sketch), not
    // O(stream), and KLL merge is associative so the fold is
    // batching-invariant by construction (the mergeable-summary
    // family contract). The drained sketch's median must satisfy
    // q_sketch_kll's exact rank-window contract against the batch
    // events table, and the folded row count must equal the exact
    // count (no rows lost across batches/swaps). Only contract
    // booleans + exact counts are emitted — KLL compaction is
    // randomized, so the median itself is not layout-deterministic
    // (the q_sketch_kll precedent). State writes ride swapState.
    "q_stream_quantile" -> ((s, d) => {
      val K = 200
      val eps = 2.296 / math.pow(K.toDouble, 0.9)
      val state = freshDir("q_stream_quantile") + "/qs"
      val stream = EventsStream.replay(s, d)
        .select(expr("cast(value * 100 as bigint)").as("cents"))
      drain(s, stream, "append")(foldKll(state, K))
      recoverState(state)
      // an empty stream delivers ZERO micro-batches (no fold, no state
      // dir) — the monitor reports nothing, it does not throw
      val st =
        if (new java.io.File(state).exists())
          s.read.parquet(state)
            .select(expr("kll_sketch_get_quantile_bigint(sk, 0.5)").as("med"),
              col("n"))
        else s.range(0).select(lit(null).cast("bigint").as("med"),
          lit(0L).as("n"))
      val cents = Tables(s, d, "events")
        .select(expr("cast(value * 100 as bigint)").as("cents"))
      val band = lit(2.0 * eps) * col("n")
      cents.crossJoin(broadcast(st))
        .groupBy(col("med"), col("n"))
        .agg(
          sum(when(col("cents") < col("med"), 1L).otherwise(0L)).as("below"),
          sum(when(col("cents") <= col("med"), 1L).otherwise(0L))
            .as("at_or_below"),
          count(lit(1)).as("n_exact"))
        .select(col("n"),
          (col("n") === col("n_exact")).as("counts_match"),
          ((col("at_or_below") >= col("n") * 0.5 - band) &&
            (col("below") + 1 <= col("n") * 0.5 + band)).as("within_bound"))
    }),

    // Restart-recovery over MERGED-SKETCH state — the EIGHTEENTH
    // oracle-gated drain: q_stream_restart's kill-and-resume protocol
    // replayed over the KLL quantile fold, the remaining untested
    // recovery surface (r9 verdict item 6). Three disjoint event
    // slices as source files, maxFilesPerTrigger=1 → 3 micro-batches;
    // the sink folds each batch's sketch into the ONE persistent
    // state row through swapState, then dies AFTER the batch-1 swap
    // and BEFORE the checkpoint commit — the exact window where a
    // restarted stream re-delivers batch 1. The resumed drain must
    // skip the replayed merge (foldKllIdem's last_id high-water) and
    // fold only batch 2; counts_match then proves EXACTLY-ONCE
    // semantics end to end (a lost batch undercounts, a double-fold
    // overcounts — either flips the boolean), and within_bound is
    // the same rank-window contract as q_stream_quantile. Death is
    // planted in the sink, not the swap: the swap's own crash windows
    // are spec'd by StatefulStreamingSpec's swapState kills.
    "q_stream_quantile_restart" -> ((s, d) => {
      val K = 200
      val eps = 2.296 / math.pow(K.toDouble, 0.9)
      val root = freshDir("q_stream_quantile_restart")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val ckpt = root + "/ckpt"
      val state = root + "/qs"
      val marker = new java.io.File(root, "killed")
      val ev = Tables(s, d, "events")
        .select(expr("cast(value * 100 as bigint)").as("cents"),
          col("event_id"))
      def writeFile(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = new java.io.File(root, "tmp_" + name)
        df.select(col("cents")).coalesce(1)
          .write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file for $name"))
        val dst = new java.io.File(src, name + ".parquet")
        require(part.renameTo(dst), s"stage $name failed")
        dst.setLastModified(mtime)
        graft.Fs.deleteRec(tmp)
      }
      val t0 = System.currentTimeMillis() - 60000
      // disjoint slices covering the table exactly once — a sketch
      // fold (unlike the dedup gate) must see every row exactly once
      writeFile(ev.filter(col("event_id") % 3 === 0), "f1", t0)
      writeFile(ev.filter(col("event_id") % 3 === 1), "f2", t0 + 2000)
      writeFile(ev.filter(col("event_id") % 3 === 2), "f3", t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      def stream() = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      def sink(dieAtBatch1: Boolean): (DataFrame, Long) => Unit =
        (batch, id) => {
          foldKllIdem(state, K)(batch, id)
          if (dieAtBatch1 && id == 1 && marker.createNewFile())
            sys.error("planted mid-drain failure (quantile restart gate)")
        }
      val died =
        try { drainFrom(s, stream(), "append", ckpt)(sink(true)); false }
        catch {
          case _: org.apache.spark.sql.streaming.StreamingQueryException =>
            true
        }
      require(died && marker.exists(),
        "q_stream_quantile_restart: the first drain must die on " +
          "batch 1 — the replay no longer produces multiple micro-batches")
      drainFrom(s, stream(), "append", ckpt)(sink(false))
      recoverState(state)
      // n > 0 guard: an all-empty-batch history merges the NULL
      // sketches into an EMPTY (non-null) KLL buffer, which
      // get_quantile rejects — the CaseWhen short-circuit keeps the
      // empty-stream path from ever evaluating it
      val st = s.read.parquet(state)
        .select(when(col("n") > 0L,
          expr("kll_sketch_get_quantile_bigint(sk, 0.5)")).as("med"),
          col("n"))
      val cents = Tables(s, d, "events")
        .select(expr("cast(value * 100 as bigint)").as("cents"))
      val band = lit(2.0 * eps) * col("n")
      cents.crossJoin(broadcast(st))
        .groupBy(col("med"), col("n"))
        .agg(
          sum(when(col("cents") < col("med"), 1L).otherwise(0L)).as("below"),
          sum(when(col("cents") <= col("med"), 1L).otherwise(0L))
            .as("at_or_below"),
          count(lit(1)).as("n_exact"))
        .select(col("n"),
          (col("n") === col("n_exact")).as("counts_match"),
          ((col("at_or_below") >= col("n") * 0.5 - band) &&
            (col("below") + 1 <= col("n") * 0.5 + band)).as("within_bound"))
    }),

    // Streaming distinct-cardinality monitor — the NINETEENTH
    // oracle-gated drain and the cardinality member of the
    // mergeable-summary family: per micro-batch, the batch's HLL
    // sketch of user_id (Spark 4 native hll_* over the bundled
    // DataSketches) unions into ONE persistent (sketch, count) row.
    // This is how a 100 TB stream tracks "distinct users so far"
    // without user-universe state: O(2^lgK) bytes forever, vs the
    // exact dropDuplicates state q_stream_srm's units grain carries.
    // The drained estimate must land within 4·rse (rse =
    // 1.04/√2^lgK, the q_sketch_union contract — lgK=12 keeps this
    // data in the sketch's exact sparse mode, so the boolean cannot
    // flake) of the exact batch distinct, and the folded row count
    // must equal the exact event count (no rows lost across
    // batches/swaps). State writes ride swapState.
    "q_stream_hll" -> ((s, d) => {
      val LG_K = 12
      val state = freshDir("q_stream_hll") + "/hs"
      val stream = EventsStream.replay(s, d).select(col("user_id"))
      drain(s, stream, "append")(foldHll(state, LG_K))
      recoverState(state)
      val st =
        if (new java.io.File(state).exists())
          s.read.parquet(state)
            .select(when(col("n") > 0L,
              expr("hll_sketch_estimate(sk)")).as("est"), col("n"))
        else s.range(0).select(lit(null).cast("bigint").as("est"),
          lit(0L).as("n"))
      val exact = Tables(s, d, "events")
        .agg(countDistinct(col("user_id")).as("exact_distinct"),
          count(lit(1)).as("n_exact"))
      val band = lit(4 * 1.04 / math.sqrt((1 << LG_K).toDouble))
      st.crossJoin(broadcast(exact))
        .select(col("n"), col("exact_distinct"),
          (col("n") === col("n_exact")).as("counts_match"),
          (abs(col("est").cast("double") -
            col("exact_distinct").cast("double")) <=
            band * col("exact_distinct").cast("double")).as("within_bound"))
    }),

    // Streaming n-gram novelty — the TWENTY-SECOND oracle-gated drain
    // and the decontamination family's live member: document batches
    // arrive as file slices and each batch's distinct (split, trigram)
    // cells (the Dedup.gramSplits kernel — one definition, two paths)
    // accrete into the persistent distinct-gram set; the drained set
    // feeds the same noveltyReport and is gated by the batch
    // q_ngram_coverage oracle verbatim. This is how an ingestion
    // pipeline watches eval-novelty decay live (training n-grams
    // leaking into the eval stream) without rescanning history.
    "q_stream_ngram_novelty" -> ((s, d) => {
      val root = freshDir("q_stream_ngram_novelty")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val state = root + "/gs"
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 0), "f1", t0)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 1), "f2", t0 + 2000)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 2), "f3", t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append")(foldGramSet(state))
      recoverState(state)
      import org.apache.spark.sql.types.StringType
      val grams = readStateOr(s, state, Seq(
        ("split", "split", StringType), ("g", "g", StringType)))
      Dedup.noveltyReport(grams)
    }),

    // STREAMING INDEX ADMISSION — the TWENTY-FOURTH oracle-gated
    // drain (VERDICT r10 item 6): the suite's three stored-index
    // admission modes (q_dedup_incremental / q_ann_incremental /
    // q_bm25_incremental) are batch queries; this runs the retrieval
    // one AS A STREAM. Document slices commit as micro-batches and
    // each batch's exact-long stats vector folds into the persistent
    // index statistics ([[foldBm25Stats]] — the segment-commit merge
    // as a sum-monoid fold, 1-row state forever); at drain end the
    // arriving batch (doc_id % 7 = 3, the shared crawl stand-in) is
    // scored UNDER THE DRAINED STATS through the same bm25ScoreWith
    // kernel. Because the stats are mergeable and the corpus is
    // exactly what arrived, drained stats ≡ whole-corpus stats, so
    // the gate is the batch q_bm25_incremental oracle VERBATIM — a
    // structural equality, not a tolerance: one lost or double-merged
    // slice moves every score's df/avgdl and fails the hash.
    "q_stream_bm25_admission" -> ((s, d) => {
      val terms = Seq("dup", "vector", "query")
      val root = freshDir("q_stream_bm25_admission")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val state = root + "/bs"
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 0), "f1", t0)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 1), "f2", t0 + 2000)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 2), "f3", t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append")(foldBm25Stats(state, terms))
      recoverState(state)
      import org.apache.spark.sql.types.LongType
      val stats = readStateOr(s, state,
        ("nd", "nd", LongType) +: ("sdl", "sdl", LongType) +:
          terms.map(t =>
            (s"dfl_$t", s"dfl_$t",
              LongType: org.apache.spark.sql.types.DataType)))
      TextAnalytics.bm25ScoreWith(
        TextAnalytics.bm25DocsFrom(docs.filter(col("doc_id") % 7 === 3)),
        stats, terms)
        .orderBy(col("doc_id"))
    }),

    // STREAMING DEDUP ADMISSION — the TWENTY-SIXTH oracle-gated
    // drain, completing ALL THREE stored-index admission modes as
    // streams (bm25 = stats fold #24, ANN = static vector model #25,
    // and now minhash dedup): the index's content hashes and banded
    // signatures are prepared ONCE (Dedup.dedupIndex — the stored
    // tables prior runs maintain, localCheckpointed so micro-batches
    // probe them instead of re-mining the corpus), each arriving
    // document slice gets its verdicts through the SAME Dedup
    // .dedupAdmit kernel as the batch query, and results land in the
    // batchId-keyed OVERWRITE sink (exactly-once under replay, the
    // q_stream_restart pattern). Per-doc verdicts depend only on the
    // doc and the static index, so the union over batches ≡ the
    // batch query: gated by the q_dedup_incremental oracle VERBATIM.
    "q_stream_dedup_admission" -> ((s, d) => {
      val root = freshDir("q_stream_dedup_admission")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val out = root + "/out"
      val newDocs = Dedup.corpus(Tables(s, d, "documents"))
        .filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"), col("text"))
      val (hashedIdxRaw, bandedIdxRaw) = Dedup.dedupIndex(s, d)
      val hashedIdx = hashedIdxRaw.localCheckpoint()
      val bandedIdx = bandedIdxRaw.localCheckpoint()
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, newDocs.filter(col("doc_id") % 3 === 0), "f1", t0)
      stageFile(root, src, newDocs.filter(col("doc_id") % 3 === 1), "f2",
        t0 + 2000)
      stageFile(root, src, newDocs.filter(col("doc_id") % 3 === 2), "f3",
        t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append") { (batch, id) =>
        Dedup.dedupAdmit(batch, hashedIdx, bandedIdx)
          .write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      s.read.parquet(out + "/b*").orderBy(col("doc_id"))
    }),

    // STREAMING TOKENIZER ENCODE — the THIRTIETH oracle-gated drain:
    // a trained tokenizer served as a STORED MODEL to a stream, the
    // way a live ingest actually tokenizes (the model trains offline,
    // the stream only APPLIES it). The unigram cost table is prepared
    // ONCE (memoized, vocabulary-sized) and inlined as a literal map;
    // each arriving document slice Viterbi-counts its own pieces
    // through the SAME uniPieceCountCol kernel as the batch query and
    // lands in the batchId-keyed OVERWRITE sink (exactly-once under
    // replay, the q_stream_restart pattern). Per-doc counts depend
    // only on the doc and the static model, so the union over batches
    // ≡ the batch query: gated by the q_unigram_encode oracle
    // VERBATIM (fifth served-model modality after bm25 stats, ANN
    // vectors, minhash text and media identity).
    "q_stream_unigram_encode" -> ((s, d) => {
      val root = freshDir("q_stream_unigram_encode")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val out = root + "/out"
      // train (memoized) BEFORE the drain: the stream only applies —
      // the map is captured in the foreachBatch closure, so the drain
      // can never encode under a model trained for another dataset
      val model = TextAnalytics.trainedUnigramModelFor(s, d)
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 0), "f1", t0)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 1), "f2",
        t0 + 2000)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 2), "f3",
        t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append") { (batch, id) =>
        TextAnalytics.unigramEncodeFrame(model)(batch)
          .write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      s.read.parquet(out + "/b*").orderBy(col("doc_id"))
    }),

    // STREAMING BPE TOKENIZE — the THIRTY-THIRD oracle-gated drain and
    // drain #30's family twin: the OTHER trained tokenizer (the
    // graft.bpe.rounds merge table) served as a stored model to a
    // document stream, so BOTH families the q_tokenizer_compare
    // bake-off adjudicates have a live-ingest serving path. Model
    // trains (memoized) before the drain and is threaded explicitly
    // into the foreachBatch closure (the r13 no-process-global
    // discipline); per-doc counts depend only on doc + static merge
    // table ⇒ union over batches ≡ the batch q_tokenize_bpe, whose
    // oracle gates it VERBATIM. Sixth served-model modality.
    "q_stream_bpe_encode" -> ((s, d) => {
      val root = freshDir("q_stream_bpe_encode")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val out = root + "/out"
      val merges = TextAnalytics.trainedBpeMergesFor(s, d)
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 0), "f1", t0)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 1), "f2",
        t0 + 2000)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 2), "f3",
        t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append") { (batch, id) =>
        TextAnalytics.bpeEncodeFrame(merges)(batch)
          .write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      s.read.parquet(out + "/b*").orderBy(col("doc_id"))
    }),

    // STREAMING INDEX DELETION — the THIRTY-FIRST oracle-gated drain
    // and the maintenance TWIN of q_stream_ann_admission: where that
    // drain grows a stored index from an arriving vector feed, this
    // one SHRINKS it from an arriving tombstone feed — the GDPR-
    // erasure / retention-expiry path a 100 TB index serves without
    // rebuilds. ORDER-DEPENDENT state (the q_stream_seq_pack family):
    // the state IS the evolving edge set, kept in batchId-keyed
    // parquet (state/b{-1,0,1}; batch i reads b{i-1}, writes b{i} —
    // exactly-once under replay because a re-run batch rewrites its
    // own output from its own input). Each batch applies the SAME
    // Similarity.repairStep kernel as the one-shot q_ann_delete
    // (tombstone + cosine-capped 2-hop re-route + md5-capped
    // re-symmetrization); order matters — a bridge routed through a
    // node deleted in a LATER batch is re-repaired then — so the
    // incremental chain is its own semantics and the oracle unrolls
    // the chain in arrival order (repairDuck per staged batch), not
    // the one-shot repair. Per-batch work touches only the batch's
    // tombstone neighborhoods; state is edge-set-sized (k·N at any
    // corpus), never visited-set- or history-sized.
    "q_stream_ann_delete" -> ((s, d) => {
      val root = freshDir("q_stream_ann_delete")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val state = root + "/g"
      val (nodes, delIds, gPre) = Similarity.deleteGraphParts(s, d)
      gPre.write.mode("overwrite").parquet(s"$state/b-1")
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, delIds.filter(col("did") % 18 === 4), "f1", t0)
      stageFile(root, src, delIds.filter(col("did") % 18 =!= 4), "f2",
        t0 + 2000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      // ADVICE r14: track the last batchId actually committed instead
      // of hardcoding b1 — a source that delivers both files in one
      // trigger (or an extra empty trigger re-writing state from its
      // predecessor, a no-op chain link) then still reads the true
      // final state; -1 (no batches) degrades to the pre graph.
      val lastB = new java.util.concurrent.atomic.AtomicLong(-1L)
      drain(s, stream, "append") { (batch, id) =>
        val cur = s.read.parquet(s"$state/b${id - 1}")
        Similarity.repairStep(nodes, cur, batch.select(col("did")))
          .write.mode("overwrite").parquet(s"$state/b$id")
        lastB.set(math.max(lastB.get(), id))
        ()
      }
      s.read.parquet(s"$state/b${lastB.get()}")
        .orderBy(col("src"), col("dst"))
    }),

    // STREAMING ANN SERVING — the THIRTY-SECOND oracle-gated drain
    // (VERDICT r14 item 2) and the piece that completes the graph-ANN
    // lifecycle's ONLINE half: build/admit/delete/filter all maintain
    // the index; this serves it. The index (nodes + NSW search graph)
    // is built offline ONCE and written to parquet — the stored
    // state; queries then arrive as a micro-batch stream and each
    // batch walks the STORED graph via stream-static joins per hop
    // (Similarity.serveTopK: routed entry, beam 4, 7 hops, top-3),
    // stateless like q_stream_enrich — per-query independence means
    // ANY batching drains to exactly the one-shot batch walk, which
    // is the oracle. Reference shape: the per-post enrichment loop
    // (posts-from-hashtags.js:294-352) is a query stream against
    // stored state. At corpus scale the stored index is the only
    // large object and it never moves — per-trigger cost is
    // |batch|·beam·degree rows of equi-joins.
    "q_stream_ann_search" -> ((s, d) => {
      val root = freshDir("q_stream_ann_search")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val out = root + "/out"
      val (nodes, g, qs) = Similarity.serveIndexParts(s, d)
      nodes.write.mode("overwrite").parquet(s"$root/idx_nodes")
      g.write.mode("overwrite").parquet(s"$root/idx_g")
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, qs.filter(col("qid") % 2 === 0), "f1", t0)
      stageFile(root, src, qs.filter(col("qid") % 2 =!= 0), "f2",
        t0 + 2000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append") { (batch, id) =>
        val idxN = s.read.parquet(s"$root/idx_nodes")
        val idxG = s.read.parquet(s"$root/idx_g")
        Similarity.serveTopK(idxN, idxG, batch)
          .write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      s.read.parquet(s"$out/b*").orderBy(col("qid"), col("rk"))
    }),

    // SERVE + MAINTAIN INTERLEAVED — the THIRTY-FOURTH oracle-gated
    // drain and the COMPOSITION the lifecycle pieces exist for: one
    // mixed feed carries query batches AND tombstone batches against
    // ONE evolving stored index, and serving is read-your-writes —
    // the SAME query set runs before and after the maintenance batch
    // and the answers legitimately differ (pre-phase top-3 still
    // serves tombstoned ids; post-phase walks the repaired graph
    // with alive-routed entries). State = (node frame, edge frame)
    // in batchId-keyed parquet (the drain-#31 exactly-once
    // convention); a delete batch applies repairStep and shrinks the
    // node state, a query batch serves against the CURRENT state and
    // copies state forward. Arrival order is the semantics (staged
    // mtime order: queries, deletes, queries) and the oracle unrolls
    // exactly that order. Feed rows are a unified schema
    // (kind q/d + the union of both payloads) — the one-stream
    // control-plane shape a serving tier actually receives.
    "q_stream_ann_serve_maintain" -> ((s, d) => {
      val root = freshDir("q_stream_ann_serve_maintain")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val out = root + "/out"
      val state = root + "/st"
      val (nodes, delIds, gPre) = Similarity.deleteGraphParts(s, d)
      nodes.write.mode("overwrite").parquet(s"$state/n-1")
      gPre.write.mode("overwrite").parquet(s"$state/g-1")
      val qs = nodes.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("nrm").as("qnrm"), col("blk").as("qblk"))
      def qFile(phase: String) = qs.select(lit("q").as("kind"),
        lit(phase).as("phase"), col("qid"), col("qv"), col("qnrm"),
        col("qblk"), lit(null).cast("long").as("did"))
      val dFile = delIds.select(lit("d").as("kind"),
        lit(null).cast("string").as("phase"),
        lit(null).cast("long").as("qid"),
        lit(null).cast("array<double>").as("qv"),
        lit(null).cast("double").as("qnrm"),
        lit(null).cast("string").as("qblk"), col("did"))
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, qFile("pre"), "f1", t0)
      stageFile(root, src, dFile, "f2", t0 + 2000)
      stageFile(root, src, qFile("post"), "f3", t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append") { (batch, id) =>
        val curN = s.read.parquet(s"$state/n${id - 1}")
        val curG = s.read.parquet(s"$state/g${id - 1}")
        val dels = batch.filter(col("kind") === "d").select(col("did"))
        // deletes apply BEFORE serving within a batch (documented
        // order; under maxFilesPerTrigger=1 a batch is pure anyway)
        val (newN, newG) =
          if (dels.isEmpty) (curN, curG)
          else (curN.join(dels.select(col("did").as("vec_id")),
              Seq("vec_id"), "left_anti"),
            Similarity.repairStep(curN, curG, dels))
        newN.write.mode("overwrite").parquet(s"$state/n$id")
        newG.write.mode("overwrite").parquet(s"$state/g$id")
        val qrows = batch.filter(col("kind") === "q")
          .select(col("phase"), col("qid"), col("qv"), col("qnrm"),
            col("qblk")).localCheckpoint()
        if (!qrows.isEmpty) {
          val ph = qrows.select(col("phase")).first().getString(0)
          Similarity.serveTopK(
              s.read.parquet(s"$state/n$id"),
              s.read.parquet(s"$state/g$id"),
              qrows.drop("phase"))
            .select(lit(ph).as("phase"), col("qid"), col("rk"),
              col("nid"), col("sim"))
            .write.mode("overwrite").parquet(s"$out/b$id")
        }
        ()
      }
      s.read.parquet(s"$out/b*")
        .orderBy(col("phase"), col("qid"), col("rk"))
    }),

    // STREAMING SEQUENCE PACKING — the TWENTY-NINTH oracle-gated
    // drain and the first ORDER-DEPENDENT state fold (see
    // [[foldSeqPack]]): the concat-and-cut training layout built
    // incrementally as document slices arrive IN ORDER (doc-id-RANGE
    // staged files — packing is the one pipeline stage where arrival
    // order is semantics), per-source pack cursor + open-sequence
    // partials as |sources|-sized state, closed sequences emitted
    // per batch, open tails flushed at the end. emitted ∪ flush ≡
    // the batch q_seq_pack — gated by its oracle VERBATIM.
    "q_stream_seq_pack" -> ((s, d) => {
      val root = freshDir("q_stream_seq_pack")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val out = root + "/out"
      val state = root + "/sp"
      val docs = Tables(s, d, "documents")
        .select(col("source"), col("doc_id"), col("text"))
      val mxRow = docs.agg(max(col("doc_id"))).first()
      val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      // slice count as a sysprop (default = the house 3-file replay):
      // the r13 trigger-cost audit knob (VERDICT item 5). SeqPackSpec
      // proves the fold is slicing-invariant (1/2/5 cuts), so the
      // knob trades ONLY trigger count against per-trigger volume;
      // MEASURED (sf0.1, cpus=16, warm session, 3 reps): 3.3/4.2/6.3 s
      // at 2/3/5 slices — ~1.0 s per extra trigger (the state-store
      // commit + micro-batch planning floor), while the data cost is
      // flat (the 2-slice batches carry 2.5x the rows of the 5-slice
      // ones at identical per-slice cost). The trigger-sizing
      // contract at 100 TB follows: size micro-batches by the
      // trigger floor, never by state — state is |sources|-sized at
      // ANY slicing, so fewer, larger ordered slices are strictly
      // cheaper until a single batch no longer fits the ingest
      // window.
      val slices =
        sys.props.get("graft.seqpack.slices").map(_.toInt).getOrElse(3)
      val t0 = System.currentTimeMillis() - 60000
      (0 until slices).foreach { k =>
        val hi = if (k == slices - 1) Long.MaxValue else mx * (k + 1) / slices
        val lo = mx * k / slices
        val slice =
          if (k == 0) docs.filter(col("doc_id") <= hi)
          else docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
        stageFile(root, src, slice, s"f$k", t0 + 2000L * k)
      }
      val sch = s.read.parquet(src.getPath + "/f0.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append")(foldSeqPack(state, out))
      recoverState(state)
      import org.apache.spark.sql.types.LongType
      import org.apache.spark.sql.types.StringType
      val flush = readStateOr(s, state, Seq(
          ("source", "source", StringType),
          ("oseq_id", "seq_id", LongType),
          ("o_n_docs", "n_docs", LongType),
          ("o_n_doc_starts", "n_doc_starts", LongType),
          ("o_first_doc", "first_doc", LongType),
          ("o_last_doc", "last_doc", LongType),
          ("o_n_tokens", "n_tokens", LongType)))
        .filter(col("seq_id") >= 0L)
      Extras.seqPackReport(
        s.read.parquet(out + "/b*").unionByName(flush))
    }),

    // STREAMING MEDIA-IDENTITY ADMISSION — the TWENTY-EIGHTH
    // oracle-gated drain and the crossmodal member of the admission
    // family (VERDICT r11 item 5; bm25 = stats fold #24, ANN = static
    // vector model #25, minhash dedup #26, and now the 64-bit pHash
    // index): the stored image-identity index (Multimodal.phashIndex
    // — distinct hashes + canonical partner, agg-collapsed BEFORE any
    // probe) is prepared ONCE and localCheckpointed; each arriving
    // document slice generates, REAL-decodes and hashes its own
    // images batch-side and probes the static index through the SAME
    // pigeonhole kernel as the batch query (Multimodal.phashAdmit),
    // landing verdicts in the batchId-keyed OVERWRITE sink (exactly-
    // once under replay, the q_stream_restart pattern). Per-image
    // verdicts depend only on the image and the static index, so the
    // union over batches ≡ the batch query: gated by the
    // q_phash_admission oracle VERBATIM.
    "q_stream_phash_admission" -> ((s, d) => {
      val root = freshDir("q_stream_phash_admission")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val out = root + "/out"
      val docs = Tables(s, d, "documents").select(col("doc_id"))
      val newDocs = docs.filter(col("doc_id") % 7 === 3)
      val idxh = Multimodal.phashIndex(s, docs).localCheckpoint()
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, newDocs.filter(col("doc_id") % 3 === 0), "f1", t0)
      stageFile(root, src, newDocs.filter(col("doc_id") % 3 === 1), "f2",
        t0 + 2000)
      stageFile(root, src, newDocs.filter(col("doc_id") % 3 === 2), "f3",
        t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append") { (batch, id) =>
        Multimodal.phashAdmit(s, batch, idxh)
          .write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      s.read.parquet(out + "/b*").orderBy(col("img_id"))
    }),

    // STREAMING VECTOR ADMISSION — the TWENTY-FIFTH oracle-gated
    // drain, completing the stored-index admission trio AS STREAMS
    // (q_stream_bm25_admission = the stats-fold member; this is the
    // static-model member): the two-level IVF model and the index's
    // list assignments are prepared ONCE before the drain
    // (Similarity.annIndexModel — the stored column prior runs
    // maintain, localCheckpointed so micro-batches reuse it instead
    // of re-deriving the index side), then each arriving vector slice
    // is admitted through the SAME annAdmitWith kernel as the batch
    // query and lands in a batchId-keyed OVERWRITE sink — the
    // exactly-once foreachBatch pattern of q_stream_restart, so a
    // replayed batch rewrites its own output instead of duplicating
    // rows. Per-vector admission depends only on the vector and the
    // static index, so the union over batches ≡ the batch query over
    // all new vectors: the gate is the q_ann_incremental oracle
    // VERBATIM. Per-batch work is batch-sized (assignment is one
    // codegen node; the probe join broadcasts the batch).
    "q_stream_ann_admission" -> ((s, d) => {
      val root = freshDir("q_stream_ann_admission")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val out = root + "/out"
      val newVecs = Similarity.loadEmbeddings(s, d)
        .filter(col("vec_id") % 7 === 3)
      Similarity.annIndexModel(s, d) match {
        case None => Similarity.annAdmitEmpty(s)
        case Some((model, candRaw)) =>
          val cand = candRaw.localCheckpoint()
          val t0 = System.currentTimeMillis() - 60000
          stageFile(root, src,
            newVecs.filter(col("vec_id") % 3 === 0), "f1", t0)
          stageFile(root, src,
            newVecs.filter(col("vec_id") % 3 === 1), "f2", t0 + 2000)
          stageFile(root, src,
            newVecs.filter(col("vec_id") % 3 === 2), "f3", t0 + 4000)
          val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
          val stream = s.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1).parquet(src.getPath)
          drain(s, stream, "append") { (batch, id) =>
            Similarity.annAdmitWith(model, cand, batch)
              .write.mode("overwrite").parquet(s"$out/b$id")
            ()
          }
          s.read.parquet(out + "/b*")
            .orderBy(col("qid"), col("rk"))
      }
    }),

    // BOUNDED-state streaming novelty — the TWENTY-THIRD oracle-gated
    // drain and q_stream_ngram_novelty's deployable twin (VERDICT r10
    // item 4): the exact drain's distinct-gram set is the ONE drain
    // state that grows with data (corpus-vocabulary-sized at 100 TB);
    // here each batch folds per-split gram THETA sketches
    // ([[foldGramTheta]]) — O(2^lgK) per split forever — and novelty
    // comes from sketch SET ALGEBRA at report time:
    // est_novel(split) = estimate(theta_difference(split_sk,
    // train_sk)), the A-not-B the HLL family cannot express (the
    // q_sketch_theta rationale, now as persistent stream state). The
    // accuracy CONTRACT is the q_stream_hll pattern: folded doc
    // counts must equal the exact per-split counts (row conservation
    // across batches/swaps — counts_match), and both estimates must
    // land within 4·rse(k=2^lgK) of the exact batch-kernel values
    // (difference scaled by the exact |eval ∪ train| per the
    // published error model) — deterministic booleans: theta retains
    // the k smallest hashes, a pure function of the gram set, so the
    // estimate cannot move between runs or batchings. Precondition
    // shared with the exact twin: a corpus with a train split (the
    // difference needs its B side; EmptyInputSpec covers the
    // no-corpus case — empty state → empty report).
    "q_stream_novelty_theta" -> ((s, d) => {
      val LG_K = 12
      val root = freshDir("q_stream_novelty_theta")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val state = root + "/ts"
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 0), "f1", t0)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 1), "f2", t0 + 2000)
      stageFile(root, src, docs.filter(col("doc_id") % 3 === 2), "f3", t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append")(foldGramTheta(state, LG_K))
      recoverState(state)
      import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
      val st = readStateOr(s, state, Seq(
        ("split", "split", StringType), ("sk", "sk", BinaryType),
        ("n_docs", "n_docs", LongType)))
      val train = st.filter(col("split") === "train")
        .select(col("sk").as("tsk"))
      val est = st.filter(col("split") =!= "train")
        .crossJoin(broadcast(train))
        .select(col("split"), col("n_docs"),
          expr("theta_sketch_estimate(sk)").as("est_ngrams"),
          expr("theta_sketch_estimate(theta_difference(sk, tsk))")
            .as("est_novel"))
      val grams = Dedup.gramSplits(docs)
      val exact = Dedup.noveltyReport(grams)
        .select(col("split"), col("n_ngrams"), col("n_seen"))
      val nTrain = grams.filter(col("split") === "train")
        .agg(count(lit(1)).as("n_train"))
      val docsExact = docs.select(Dedup.splitCol.as("split"))
        .groupBy(col("split")).agg(count(lit(1)).as("n_docs_exact"))
      // DEBUGGING (VERDICT r12 item 3): the oracle pins the three
      // booleans below as TRUE constants, so a sketch-estimate drift
      // outside the 4·rse band surfaces as an opaque STRICT hash
      // mismatch — when this row reds, inspect counts_match /
      // ngrams_ok / novel_ok in the Spark output first; whichever is
      // false names the broken contract before any hash diffing.
      val band = lit(4 * 1.04 / math.sqrt((1 << LG_K).toDouble))
      est.join(exact, Seq("split"))
        .join(docsExact, Seq("split"))
        .crossJoin(broadcast(nTrain))
        .select(col("split"), col("n_ngrams"), col("n_seen"),
          (col("n_docs") === col("n_docs_exact")).as("counts_match"),
          (abs(col("est_ngrams") - col("n_ngrams").cast("double")) <=
            band * col("n_ngrams").cast("double")).as("ngrams_ok"),
          (abs(col("est_novel") -
            (col("n_ngrams") - col("n_seen")).cast("double")) <=
            band * (col("n_ngrams") + col("n_train") - col("n_seen"))
              .cast("double")).as("novel_ok"))
        .orderBy(col("split"))
    }),

    // Streaming per-dimension moment maintenance — the TWENTY-FIRST
    // oracle-gated drain: embedding batches arrive as files (vec_id
    // % 3 slices, maxFilesPerTrigger=1 — the sliced-replay device of
    // the restart gates), and each micro-batch's per-dim (n, Σs, Σs²)
    // moments (the Similarity.dimCells/dimMoments kernels — one
    // definition, two paths) fold into the persistent 64-row grid by
    // addition. This is how a live embedding pipeline watches for a
    // dying encoder head WITHOUT rescanning the corpus: the drained
    // grid feeds the same dimReport and is gated by the batch
    // q_dim_audit oracle verbatim. State is dim-grid-sized at any
    // stream length; DECIMAL(38,0) sums stay exact forever.
    "q_stream_dim_audit" -> ((s, d) => {
      val root = freshDir("q_stream_dim_audit")
      val src = new java.io.File(root, "src")
      src.mkdirs()
      val state = root + "/dm"
      val ev = Tables(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val t0 = System.currentTimeMillis() - 60000
      stageFile(root, src, ev.filter(col("vec_id") % 3 === 0), "f1", t0)
      stageFile(root, src, ev.filter(col("vec_id") % 3 === 1), "f2", t0 + 2000)
      stageFile(root, src, ev.filter(col("vec_id") % 3 === 2), "f3", t0 + 4000)
      val sch = s.read.parquet(src.getPath + "/f1.parquet").schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      drain(s, stream, "append")(foldDimMoments(state))
      recoverState(state)
      import org.apache.spark.sql.types.{DecimalType, LongType}
      val moments = readStateOr(s, state, Seq(
        ("dim", "dim", LongType),
        ("n", "n", LongType),
        ("s1", "s1", DecimalType(38, 0)),
        ("s2", "s2", DecimalType(38, 0))))
      Similarity.dimReport(moments)
    }),

    // Streaming schema-drift monitor — the TWENTIETH oracle-gated
    // drain: as raw-feed files commit, each micro-batch's (key, jtype)
    // cells (the Scalars.schemaCells kernel — one definition, two
    // paths) fold into the persistent audit grid, and the drained
    // state feeds the same schemaReport as the batch q_schema_drift —
    // gated by the same analytic oracle. This is how a live ingestion
    // pipeline notices a producer drifting (user flipping to string,
    // amount going null) WITHOUT re-scanning history: state is the
    // (keys × type-classes) grid at any stream length, the fold a
    // count monoid through the crash-safe swap.
    "q_stream_schema_drift" -> ((s, d) => {
      val state = freshDir("q_stream_schema_drift") + "/sc"
      val stream = Scalars.schemaCells(EventsStream.replay(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type")))
      drain(s, stream, "append")(foldSchemaCells(state))
      import org.apache.spark.sql.types.{LongType, StringType}
      val counts = readStateOr(s, state, Seq(
        ("key", "key", StringType),
        ("jtype", "jtype", StringType),
        ("n", "n", LongType)))
      Scalars.schemaReport(counts)
    }),

    // Streaming zone-map maintenance — the FIFTEENTH oracle-gated
    // streaming drain and the lakehouse member of the mergeable-state
    // family: as event files commit, each micro-batch's rows fold
    // into per-z-cell (MIN, MAX, SUM) zone maps through the
    // crash-safe swap — exactly how a table format accretes file
    // statistics at ingest time, and the live counterpart of
    // q_zonemap_prune's batch audit (shared zorderProject kernel, one
    // cell definition). State is cell-count-bounded (≤4096 rows) at any stream length; the
    // drained maps must hash-equal the batch zone aggregate.
    "q_stream_zonemap" -> ((s, d) => {
      val state = freshDir("q_stream_zonemap") + "/zm"
      val stream = Extras.zorderProject(
        EventsStream.replay(s, d).select(col("user_id"), col("ts")))
        .select(col("a"), col("b"), col("zcell"))
      drain(s, stream, "append")(foldZoneMap(state))
      import org.apache.spark.sql.types.LongType
      readStateOr(s, state, Seq(
        ("zcell", "zcell", LongType),
        ("min_a", "min_a", LongType), ("max_a", "max_a", LongType),
        ("min_b", "min_b", LongType), ("max_b", "max_b", LongType),
        ("n_rows", "n_rows", LongType)))
        .orderBy(col("zcell"))
    }),

    // Streaming freshness monitor — the TENTH oracle-gated streaming
    // query and the third stream-maintained monitor: per-type
    // (last-seen timestamp, event count) folded as a (MAX, SUM)
    // monoid — |types|-sized state at any stream length, the fold
    // batching-invariant because max and sum are associative — with
    // the drained state re-deriving q_freshness' staleness-vs-
    // frontier report exactly (the frontier is the max over the
    // per-type maxima, so it too comes from state, never a rescan).
    "q_stream_freshness" -> ((s, d) => {
      val state = freshDir("q_stream_freshness") + "/st"
      val stream = EventsStream.replay(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      drain(s, stream, "append")(foldTypeMax(state))
      val perType = {
        import org.apache.spark.sql.types.{LongType, StringType}
        readStateOr(s, state, Seq(
          ("event_type", "event_type", StringType),
          ("last_us", "last_us", LongType),
          ("n", "n_events", LongType)))
      }
      val frontier = perType.agg(max(col("last_us")).as("front_us"))
      perType.crossJoin(broadcast(frontier))
        .select(col("event_type"), col("n_events"),
          expr("(front_us - last_us) div 60000000").as("staleness_min"),
          (expr("(front_us - last_us) div 60000000") > 60L)
            .as("violates_slo"))
        .orderBy(col("event_type"))
    }),

    // Streaming CUSUM changepoint monitor — q_cusum maintained
    // incrementally, the NINTH oracle-gated streaming query and the
    // second member of the monitors-run-on-streams family with
    // q_stream_drift: the stream folds only (type, epoch-day) COUNTS
    // into grid-sized state through the same batching-invariant
    // foldBinCounts monoid; the drained statistic re-derives the whole
    // exact-integer CUSUM (closed form, count×n_days units, 8·S >
    // total flag) from state — so the output must hash-equal the
    // batch q_cusum modulo the day encoding (epoch day number here;
    // the oracle restates it). Day arithmetic is integer epoch-seconds
    // division, not a calendar function, so both engines share one
    // definition.
    // Streaming label-vote maintenance — the TWELFTH oracle-gated
    // streaming query and the labeling-pipeline member of the
    // monitors-run-on-streams family: annotations fold into the
    // (item × label) count grid through the mergeable count monoid
    // (batching-invariant, grid-sized state at any stream length),
    // and the drained state re-derives the EXACT batch majority vote
    // — same (votes desc, label) total-order tiebreak, same margin —
    // so the incremental path must hash-equal q_label_vote's oracle.
    // This is how a labeling deployment keeps votes current without
    // rescanning the annotation log per refresh.
    "q_stream_label_vote" -> ((s, d) => {
      val state = freshDir("q_stream_label_vote") + "/st"
      val stream = EventsStream.replay(s, d)
        .select((col("event_id") % 500).as("item"),
          col("event_type").as("label"))
      drain(s, stream, "append") { (batch, _) =>
        recoverState(state)
        val bc = batch.groupBy(col("item"), col("label"))
          .agg(count(lit(1)).as("n"))
        val merged =
          if (new java.io.File(state).exists())
            batch.sparkSession.read.parquet(state)
              .unionByName(bc)
              .groupBy(col("item"), col("label"))
              .agg(sum(col("n")).as("n"))
          else bc
        swapState(merged, state)
      }
      val grid = {
        import org.apache.spark.sql.types.{LongType, StringType}
        readStateOr(s, state, Seq(
          ("item", "item", LongType),
          ("label", "label", StringType),
          ("n", "votes", LongType)))
      }
      import org.apache.spark.sql.expressions.Window
      val wItem = Window.partitionBy(col("item"))
      val wRank = Window.partitionBy(col("item"))
        .orderBy(col("votes").desc, col("label"))
      grid
        .withColumn("n_ann", sum(col("votes")).over(wItem))
        .withColumn("rk", row_number().over(wRank))
        .filter(col("rk") === 1)
        .select(col("item"), col("label").as("winner"), col("votes"),
          col("n_ann"),
          round(col("votes").cast("double") /
            col("n_ann").cast("double"), 6).as("margin"))
        .orderBy(col("item"))
    }),

    // Streaming alert sink — K6 run as a stream (the ELEVENTH
    // oracle-gated streaming query): sentinel pages flow through
    // AlertSink.alertFor per micro-batch and alert ROWS append to the
    // durable alert table via the same writeAlerts sink a deployment
    // tails for email — the streaming twin of q_alert_rows (the
    // sentinel derivation keys on event_id, restated in the oracle).
    // Stateless per trigger: no watermark, no store — the alert
    // emission is a pure row map, so cost is the drain floor.
    "q_stream_alerts" -> ((s, d) => {
      val alertDir = freshDir("q_stream_alerts") + "/alerts"
      val stream = EventsStream.replay(s, d)
        .select(col("event_id"),
          concat(lit("<body>"),
            when(col("event_id") % 97 === 0, lit("Login • Instagram"))
              .when(col("event_id") % 97 === 1,
                lit("Suspicious Login Attempt"))
              .when(col("event_id") % 97 === 2,
                lit("Your Account Has Been Temporarily Locked"))
              .otherwise(lit("feed")),
            lit("</body>")).as("page"))
        .withColumn("alert",
          graft.streaming.AlertSink.alertFor(col("page")))
        .select(col("event_id"), col("alert"))
      drain(s, stream, "append")(
        graft.streaming.AlertSink.writeAlerts(alertDir))
      if (new java.io.File(alertDir).exists())
        s.read.parquet(alertDir).select(col("event_id"), col("alert"))
          .orderBy(col("event_id"))
      else s.createDataFrame(new java.util.ArrayList[Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("alert",
            org.apache.spark.sql.types.StringType))))
    }),

    "q_stream_cusum" -> ((s, d) => {
      val state = freshDir("q_stream_cusum") + "/st"
      val stream = EventsStream.replay(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("bin"))
      drain(s, stream, "append")(foldBinCounts(state))
      // the statistic itself is Discovery's ONE closed-form definition
      // — row-for-row batch equality is definitional
      Discovery.cusumFromDaily(
        readBinState(s, state, "day_no").withColumnRenamed("n", "x"),
        "day_no")
    }),

    // Streaming drift monitor — the q_psi_drift statistic maintained
    // INCREMENTALLY: monitor setup (a batch step, as in any deployed
    // monitor) fixes the bin edges, the time midpoint and the
    // reference half's (type, bin) distribution from the static table;
    // the stream then folds only current-half (type, bin) COUNTS into
    // persistent state per micro-batch — counts are the mergeable
    // monoid (the q_incremental_agg contract in streaming form), so
    // state is grid-sized (types × 10 bins) regardless of stream
    // length, and the fold is order/batching-independent. The drained
    // PSI must hash-equal the one-pass batch PSI over the same halves
    // — q_psi_drift's formula term for term (1e-6 floor, round-9
    // DECIMAL contribution sums). Multi-batch maintenance is driven
    // by a MemoryStream spec (StatefulStreamingSpec); this gate run
    // proves the end-to-end replay → fold → join → PSI path.
    "q_stream_drift" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val state = freshDir("q_stream_drift") + "/st"
      val v = col("value").cast(DecimalType(12, 2)).cast("double")
      val ev = Tables(s, d, "events").select(col("event_type"),
        unix_micros(col("ts")).as("us"), v.as("v"))
      val rng = ev.agg(min(col("us")), max(col("us")),
        min(col("v")), max(col("v"))).collect()(0)
      if (rng.isNullAt(0)) {
        // empty-input totality: nothing to monitor on an empty table
        ev.select(col("event_type"), lit(0L).as("bin"),
          lit(0L).as("n_ref"), lit(0L).as("n_cur"),
          lit(0.0).as("contrib"), lit(0.0).as("psi")).limit(0)
      } else {
      val (loUs, hiUs) = (rng.getLong(0), rng.getLong(1))
      val (loV, hiV) = (rng.getDouble(2), rng.getDouble(3))
      // degenerate value range (all values equal): one bin, not a
      // 0/0 NaN that Spark would cast to 0 and DuckDB would throw on
      val bin = if (hiV == loV) lit(0L)
      else least(lit(9L),
        floor((col("v") - loV) * 10 / (hiV - loV)).cast("long"))
      val ref = ev.filter(col("us") * 2 <= loUs + hiUs)
        .withColumn("bin", bin)
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n_ref"))
      val stream = EventsStream.replay(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          v.as("v"))
        .filter(col("us") * 2 > loUs + hiUs)
        .withColumn("bin", bin)
        .select(col("event_type"), col("bin"))
      drain(s, stream, "append")(foldBinCounts(state))
      val cur = readBinState(s, state, "bin")
        .withColumnRenamed("n", "n_cur")
      val cells = ref.join(cur, Seq("event_type", "bin"), "full_outer")
        .select(col("event_type"), col("bin"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      val wt = Window.partitionBy(col("event_type"))
      val p = greatest(col("n_ref").cast("double") /
        sum(col("n_ref")).over(wt).cast("double"), lit(1e-6))
      val q = greatest(col("n_cur").cast("double") /
        sum(col("n_cur")).over(wt).cast("double"), lit(1e-6))
      cells
        .withColumn("contrib", round((p - q) * log(p / q), 9))
        .withColumn("psi",
          sum(col("contrib").cast(DecimalType(24, 9))).over(wt)
            .cast("double"))
        .select(col("event_type"), col("bin"), col("n_ref"), col("n_cur"),
          col("contrib"), col("psi"))
        .orderBy(col("event_type"), col("bin"))
      }
    }),

    // Streaming burst monitor — the SIXTEENTH oracle-gated drain: the
    // q_burst_detect detector run the way production runs it, with
    // per-(type, day) counts accreted through foldBinCounts' merge
    // monoid (crash-safe swap, |types × days|-bounded state) as event
    // files commit, then the SAME burstZ grid/moment tail over the
    // drained state — detector and monitor are one definition
    // (Analytic.burstZ), and the drained output must hash-equal the
    // batch detector under the batch oracle. Day-grained counts mean
    // the monitor re-scores history each trigger only over the grid,
    // never the corpus.
    "q_stream_burst" -> ((s, d) => {
      val state = freshDir("q_stream_burst") + "/st"
      val stream = EventsStream.replay(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("bin"))
      drain(s, stream, "append")(foldBinCounts(state))
      Analytic.burstZ(readBinState(s, state, "day")
        .withColumnRenamed("n", "cnt"))
    }),

    // Continuous SRM monitoring — the SEVENTEENTH drain, because an
    // experimentation platform checks sample-ratio health as
    // exposures ARRIVE, not at readout: two streams fold per-arm
    // counts through foldBinCounts' merge monoid (arm as the bin
    // key) — raw exposures for the events grain, a streaming
    // dropDuplicates("user_id") for the units grain (state bounded by
    // the user universe, the q_stream_dedup posture) — and the
    // drained states feed the SAME two-cell chi-square as q_srm,
    // whose oracle gates this verbatim. One definition, two paths,
    // two grains.
    "q_stream_srm" -> ((s, d) => {
      val base = freshDir("q_stream_srm")
      val stExp = base + "/exp"
      val stUsr = base + "/usr"
      drain(s, EventsStream.replay(s, d)
        .select(lit("events").as("event_type"),
          (col("user_id") % 2).as("bin")),
        "append")(foldBinCounts(stExp))
      drain(s, EventsStream.replay(s, d)
        .select(col("user_id"), (col("user_id") % 2).as("bin"))
        .dropDuplicates("user_id")
        .select(lit("users").as("event_type"), col("bin")),
        "append")(foldBinCounts(stUsr))
      readBinState(s, stExp, "arm")
        .unionByName(readBinState(s, stUsr, "arm"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("arm") === 0L, col("n")).otherwise(0L)).as("a"),
          sum(when(col("arm") === 1L, col("n")).otherwise(0L)).as("b"))
        .withColumn("chi2",
          round(((col("a") - col("b")) * (col("a") - col("b")))
            .cast("double") /
            nullif(col("a") + col("b"), lit(0L)).cast("double"), 9))
        .select(col("event_type").as("grain"), col("a"), col("b"),
          col("chi2"), (col("chi2") > 3.841459d).as("srm_detected"))
        .orderBy(col("grain"))
    })
  )

  def oracles: Map[String, String] = Map(
    // the drained monitor must hash-equal the batch detector — the
    // q_burst_detect oracle VERBATIM (one definition, two paths)
    "q_stream_burst" -> Analytic.oracles("q_burst_detect"),

    // the tombstone-feed repair CHAIN unrolled in arrival order (NOT
    // the one-shot repair — incremental maintenance is its own
    // semantics); built by the graph-ANN machinery next to its kernel
    "q_stream_ann_delete" -> Similarity.streamDeleteOracleSql,

    // serving is stateless: the drained union across query batches
    // must equal the one-shot batch walk verbatim
    "q_stream_ann_search" -> Similarity.streamServeOracleSql,

    // interleaved serve+maintain: the staged (queries, deletes,
    // queries) order unrolled — pre walks the full index, post walks
    // the repaired one
    "q_stream_ann_serve_maintain" ->
      Similarity.streamServeMaintainOracleSql,

    // the streamed two-grain health check restates the batch q_srm
    "q_stream_srm" -> Inference.oracles("q_srm"),

    // the restart-recovered drain must reconstruct EXACTLY the events
    // table: every planted cross-file duplicate deduped, nothing lost
    // to the crash, nothing double-emitted by the re-run batch
    "q_stream_restart" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    // exact stream size; the folded sketch's rank-window and
    // count-conservation contracts are the constant-true booleans
    // (the q_sketch_kll oracle shape)
    "q_stream_quantile" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  true AS counts_match, true AS within_bound
        |FROM events""".stripMargin,

    // same contract as q_stream_quantile: a batch lost to the crash
    // undercounts n, a double-folded replay overcounts — counts_match
    // is the exactly-once proof
    "q_stream_quantile_restart" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  true AS counts_match, true AS within_bound
        |FROM events""".stripMargin,

    // exact stream size + exact distinct; the fold-conservation and
    // union-accuracy contracts are the constant-true booleans (the
    // q_sketch_union / q_stream_quantile shape)
    "q_stream_hll" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
        |  true AS counts_match, true AS within_bound
        |FROM events""".stripMargin,

    // the drained audit grid re-derives the batch report — the
    // q_schema_drift analytic oracle verbatim (one definition, two
    // paths)
    "q_stream_schema_drift" -> Scalars.oracles("q_schema_drift"),

    // the drained moment grid re-derives the batch audit — the
    // q_dim_audit oracle verbatim
    "q_stream_dim_audit" -> Similarity.oracles("q_dim_audit"),

    // the drained gram set re-derives the batch novelty audit — the
    // q_ngram_coverage oracle verbatim
    "q_stream_ngram_novelty" -> Dedup.oracles("q_ngram_coverage"),

    // the batch-admission oracle verbatim: drained mergeable stats ≡
    // whole-corpus stats, so the gate is structural equality
    "q_stream_bm25_admission" -> TextAnalytics.oracles("q_bm25_incremental"),

    // per-vector admission depends only on the vector + the static
    // stored index, so batches union to the batch query exactly
    "q_stream_ann_admission" -> Similarity.oracles("q_ann_incremental"),

    // same argument for per-document dedup verdicts
    "q_stream_dedup_admission" -> Dedup.oracles("q_dedup_incremental"),
    "q_stream_phash_admission" -> Multimodal.oracles("q_phash_admission"),
    "q_stream_unigram_encode" ->
      TextAnalytics.oracles("q_unigram_encode"),
    // the served BPE model is definitionally the batch tokenizer
    "q_stream_bpe_encode" -> TextAnalytics.oracles("q_tokenize_bpe"),
    "q_stream_seq_pack" -> Extras.oracles("q_seq_pack"),

    // fully analytic: the truncation plant from the image key, the
    // dims from the fixture formula over sources ∪ copies — the
    // q_image_gate discipline at the aggregate grain
    "q_stream_media_gate" ->
      """WITH media AS (
        |  SELECT doc_id AS img_id, doc_id AS src FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id % 17 = 4)
        |SELECT CASE WHEN img_id % 29 = 5 THEN 'undecodable'
        |         WHEN least(8 + src % 9, 8 + src % 7) < 10
        |           THEN 'too_small'
        |         ELSE 'ok' END AS reason,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM media GROUP BY 1 ORDER BY reason""".stripMargin,

    // the q_ngram_coverage counting kernel (exact n_ngrams / n_seen
    // per eval split) + the contract booleans stated as constants —
    // the q_stream_hll oracle pattern. DEBUGGING NOTE (ADVICE r11): the
    // theta ESTIMATES are never cross-checked here, so a fixture or
    // datasketches-version change that pushes an estimate outside the
    // 4·rse band surfaces as an opaque STRICT hash mismatch on this
    // row. If this oracle goes red, read the Spark-side boolean columns
    // first — counts_match / ngrams_ok / novel_ok (computed against the
    // 4·rse band in the query body above) localize which contract
    // broke before any hash diffing.
    "q_stream_novelty_theta" ->
      """WITH sp AS (
        |  SELECT text,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |              AS INTEGER) < 58982 THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |              AS INTEGER) < 62259 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT split,
        |    unnest(list_distinct(list_transform(
        |      range(1, greatest(len(string_split(lower(text),' ')) - 2, 1) + 1),
        |      i -> array_to_string((string_split(lower(text),' '))[i:i+2], ' '))))
        |      AS g
        |  FROM sp),
        |train AS (SELECT g, 1 AS seen FROM grams WHERE split = 'train')
        |SELECT e.split, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        |  CAST(COUNT(train.seen) AS BIGINT) AS n_seen,
        |  TRUE AS counts_match, TRUE AS ngrams_ok, TRUE AS novel_ok
        |FROM grams e LEFT JOIN train ON train.g = e.g
        |WHERE e.split <> 'train'
        |GROUP BY e.split ORDER BY e.split""".stripMargin,

    // the drained per-cell maps re-derive the batch zone aggregate —
    // the zorder-layout zones of q_zonemap_prune restated
    "q_stream_zonemap" ->
      s"""WITH ev AS (
        |  SELECT user_id % 256 AS a,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) % 256 AS b
        |  FROM events),
        |z AS (SELECT a, b, CAST(${Extras.zTermsSql} AS BIGINT) AS zkey FROM ev)
        |SELECT CAST(zkey >> 4 AS BIGINT) AS zcell,
        |  MIN(a) AS min_a, MAX(a) AS max_a,
        |  MIN(b) AS min_b, MAX(b) AS max_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM z GROUP BY zcell ORDER BY zcell""".stripMargin,

    // the drained (MAX, SUM) state re-derives the batch freshness
    // audit — q_freshness' oracle verbatim
    "q_stream_freshness" ->
      """WITH per_type AS (
        |  SELECT event_type, MAX(epoch_us(ts)) AS last_us,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY event_type),
        |frontier AS (SELECT MAX(last_us) AS front_us FROM per_type)
        |SELECT event_type, n_events,
        |  CAST((front_us - last_us) // 60000000 AS BIGINT)
        |    AS staleness_min,
        |  (front_us - last_us) // 60000000 > 60 AS violates_slo
        |FROM per_type, frontier ORDER BY event_type""".stripMargin,

    // the drained day-count state re-derives the exact-integer CUSUM:
    // q_cusum's oracle with the epoch-day encoding
    // the batch q_label_vote restated — the streamed fold must agree
    "q_stream_label_vote" ->
      """WITH ann AS (
        |  SELECT event_id % 500 AS item, event_type AS label FROM events),
        |counts AS (
        |  SELECT item, label, CAST(COUNT(*) AS BIGINT) AS votes
        |  FROM ann GROUP BY item, label),
        |ranked AS (
        |  SELECT item, label, votes,
        |    CAST(SUM(votes) OVER (PARTITION BY item) AS BIGINT) AS n_ann,
        |    ROW_NUMBER() OVER (PARTITION BY item
        |      ORDER BY votes DESC, label) AS rk
        |  FROM counts)
        |SELECT item, label AS winner, votes, n_ann,
        |  round(CAST(votes AS DOUBLE) / CAST(n_ann AS DOUBLE), 6) AS margin
        |FROM ranked WHERE rk = 1 ORDER BY item""".stripMargin,

    // batch restatement of the streamed sentinel→alert map
    "q_stream_alerts" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 97 = 0 THEN 'LOGIN_REQUIRED'
        |       WHEN event_id % 97 = 1 THEN 'SUSPICIOUS_ATTEMPT'
        |       WHEN event_id % 97 = 2 THEN 'ACCOUNT_LOCKED'
        |  END AS alert
        |FROM events WHERE event_id % 97 IN (0, 1, 2)
        |ORDER BY event_id""".stripMargin,

    "q_stream_cusum" ->
"""WITH daily AS (
        |  SELECT event_type,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_no,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT *,
        |    SUM(x) OVER (PARTITION BY event_type) AS tx,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nd
        |  FROM daily),
        |c AS (
        |  SELECT *, SUM(x * nd - tx) OVER (PARTITION BY event_type
        |    ORDER BY day_no) AS cdev
        |  FROM tot),
        |s AS (
        |  SELECT *, cdev - least(0, MIN(cdev) OVER (PARTITION BY event_type
        |    ORDER BY day_no)) AS s_units
        |  FROM c)
        |SELECT event_type, day_no, x AS n_events,
        |  CAST(s_units AS BIGINT) AS s_units,
        |  s_units * 8 > tx AS drift_flag
        |FROM s ORDER BY event_type, day_no""".stripMargin,

    // the drained incremental PSI state must equal the one-pass batch
    // PSI — q_psi_drift's oracle verbatim (same halves, same floor)
    "q_stream_drift" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |    CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS v
        |  FROM events),
        |rng AS (
        |  SELECT min(us) AS lo_us, max(us) AS hi_us,
        |    min(v) AS lo_v, max(v) AS hi_v FROM ev),
        |cells AS (
        |  SELECT event_type,
        |    CASE WHEN hi_v = lo_v THEN 0
        |         ELSE least(9, CAST(floor((v - lo_v) * 10 / (hi_v - lo_v))
        |           AS BIGINT)) END AS bin,
        |    CAST(SUM(CASE WHEN us * 2 <= lo_us + hi_us
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(SUM(CASE WHEN us * 2 > lo_us + hi_us
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM ev, rng GROUP BY 1, 2),
        |shares AS (
        |  SELECT *,
        |    greatest(CAST(n_ref AS DOUBLE) /
        |      SUM(n_ref) OVER (PARTITION BY event_type), 1e-6) AS p,
        |    greatest(CAST(n_cur AS DOUBLE) /
        |      SUM(n_cur) OVER (PARTITION BY event_type), 1e-6) AS q
        |  FROM cells),
        |contribs AS (
        |  SELECT *, round((p - q) * ln(p / q), 9) AS contrib FROM shares)
        |SELECT event_type, bin, n_ref, n_cur, contrib,
        |  CAST(SUM(CAST(contrib AS DECIMAL(24,9)))
        |    OVER (PARTITION BY event_type) AS DOUBLE) AS psi
        |FROM contribs ORDER BY event_type, bin""".stripMargin,

    // the batch statement of the drained stream-static enrichment
    "q_stream_enrich" ->
      """SELECT e.event_id, e.user_id,
        |  COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment
        |FROM events e
        |LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
        |           WHERE c_mktsegment = 'BUILDING') c
        |  ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    // same skewed event_id stream as the Spark side, same top-2
    // tie-break; the sketch-state guarantees are the constant-true
    // boolean (the q_sketch_* convention)
    "q_stream_topk" ->
      """WITH stream AS (
        |  SELECT CASE
        |    WHEN event_id % 4 < 2 THEN 'hot_' || CAST(event_id % 2 AS VARCHAR)
        |    WHEN event_id % 4 = 2 THEN 'mid_' || CAST(event_id % 16 AS VARCHAR)
        |    ELSE 'cold_' || CAST(event_id AS VARCHAR) END AS item
        |  FROM events)
        |SELECT item, exact_cnt, true AS within_bound FROM (
        |  SELECT item, COUNT(*) AS exact_cnt
        |  FROM stream GROUP BY item
        |  ORDER BY exact_cnt DESC, item LIMIT 2)
        |ORDER BY item""".stripMargin,

    // the drained stream-stream interval join == the batch self-join.
    "q_stream_join" ->
      """SELECT v.event_id AS view_id, b.event_id AS buy_id, v.user_id,
        |  epoch_us(v.ts) AS vts_us, epoch_us(b.ts) AS bts_us
        |FROM events v JOIN events b
        |  ON v.user_id = b.user_id
        |  AND v.event_type = 'view' AND b.event_type = 'purchase'
        |  AND b.ts BETWEEN v.ts AND v.ts + INTERVAL 1 HOUR
        |ORDER BY view_id, buy_id""".stripMargin,

    // streaming dedup of (events ∪ every-7th copy) == the events table.
    "q_stream_dedup" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    // identical to q_window_time's oracle: streaming == batch.
    "q_stream_window" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // identical to q_sessionize's oracle: custom streaming state
    // reproduces the batch window-function sessionization.
    "q_stream_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30 * 60 * 1000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    // identical to q_latest_per_key's oracle: the drained MERGE target
    // is the batch latest-per-key result.
    "q_stream_upsert" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events) t
        |WHERE rk = 1 ORDER BY user_id""".stripMargin
  )
}
