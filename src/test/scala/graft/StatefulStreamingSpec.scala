package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.streaming.EventsStream
import graft.streaming.EventsStream.{SessionAssignment, SessionEvent}

class StatefulStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState sessionization carries state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val MIN = 60L * 1000000
    val ms = MemoryStream[SessionEvent]
    val q = ms.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        EventsStream.sessionizeGroup)
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .start()
    // batch 1: two events 5 min apart (one session), then a 40-min gap
    ms.addData(SessionEvent(1, 0), SessionEvent(1, 5 * MIN), SessionEvent(1, 45 * MIN))
    q.processAllAvailable()
    // batch 2: 10 min after batch 1's last event → SAME session (state
    // carried); then a 2h gap → third session. Second user independent.
    ms.addData(SessionEvent(1, 55 * MIN), SessionEvent(1, 175 * MIN), SessionEvent(2, 0))
    q.processAllAvailable(); q.stop()

    val rows = spark.table("sessions").as[SessionAssignment]
      .collect().sortBy(a => (a.user_id, a.ts_us)).toSeq
    assert(rows == Seq(
      SessionAssignment(1, 0, 1), SessionAssignment(1, 5 * MIN, 1),
      SessionAssignment(1, 45 * MIN, 2), SessionAssignment(1, 55 * MIN, 2),
      SessionAssignment(1, 175 * MIN, 3), SessionAssignment(2, 0, 1)))
  }

  test("streaming as-of enrichment matches the native batch as-of join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.EventsStream.TaggedEvent
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TaggedEvent]
    val q = ms.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        EventsStream.asOfEnrichGroup)
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    // batch 1: state at 10, facts at 5 (no state yet) and 15
    ms.addData(TaggedEvent(1, 10, true), TaggedEvent(1, 5, false),
      TaggedEvent(1, 15, false))
    q.processAllAvailable()
    // batch 2: fact at 20 sees state 10 CARRIED ACROSS batches; new
    // state at 30; fact at 30 ties inclusively; user 2 independent
    ms.addData(TaggedEvent(1, 20, false), TaggedEvent(1, 30, true),
      TaggedEvent(1, 30, false), TaggedEvent(2, 7, false))
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("asof_stream")
      .select($"user_id", $"ts_us", $"state_ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == Seq(
      (1L, 5L, null), (1L, 15L, 10L), (1L, 20L, 10L), (1L, 30L, 30L),
      (2L, 7L, null)))

    // the native BATCH operator over the same rows agrees
    val facts = Seq((1L, 5L), (1L, 15L), (1L, 20L), (1L, 30L), (2L, 7L))
      .toDF("user_id", "ts_us")
    val stateRows = Seq((1L, 10L), (1L, 30L)).toDF("user_id", "ts_us")
    val batch = graft.plans.AsOf.join(facts, stateRows,
        keys = Seq("user_id"), leftTime = "ts_us", rightTime = "ts_us")
      .select($"user_id", $"ts_us", $"ts_us_r")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(batch == streamed)
  }

  test("RocksDB state store backs the same session_window query") {
    // at 100 TB of keyed state the HDFS-backed in-memory store OOMs;
    // RocksDB spills to local disk and is the production state backend.
    // Same query, same results — only the provider conf changes.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val MIN = 60L * 1000000
    val ms = MemoryStream[SessionEvent]
    val stream = ms.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocksdb").toString
    // provider is captured at query start — set the conf first
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = EventsStream.sessionWindowAgg(stream)
      .writeStream.format("memory").queryName("swrocks").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      ms.addData(SessionEvent(1, 0), SessionEvent(1, 10 * MIN))
      q.processAllAvailable()
      ms.addData(SessionEvent(1, 20 * MIN))
      q.processAllAvailable()
      ms.addData(SessionEvent(9, 600 * MIN))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val got = spark.table("swrocks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq((1L, 0L, 50 * MIN, 3L)))
  }

  test("native session_window: sessions merge across micro-batches, emit on watermark") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val MIN = 60L * 1000000
    val ms = MemoryStream[SessionEvent]
    val stream = ms.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventsStream.sessionWindowAgg(stream)
      .writeStream.format("memory").queryName("swagg").outputMode("append")
      .start()
    ms.addData(SessionEvent(1, 0), SessionEvent(1, 10 * MIN))
    q.processAllAvailable()
    // 10 min after the previous batch's last event → inside the gap:
    // the open session's state merges across the micro-batch boundary
    ms.addData(SessionEvent(1, 20 * MIN), SessionEvent(2, 15 * MIN))
    q.processAllAvailable()
    // advance the watermark (2h delay) far past both sessions → finalize
    ms.addData(SessionEvent(9, 600 * MIN))
    q.processAllAvailable(); q.stop()

    val got = spark.table("swagg")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 0L, 50 * MIN, 3L),        // one session spanning both batches
      (2L, 15 * MIN, 45 * MIN, 1L))) // user 9's session is still open

    // the identical declaration in batch agrees on the finalized sessions
    val batch = EventsStream.sessionWindowAgg(
        Seq((1L, 0L), (1L, 10 * MIN), (1L, 20 * MIN), (2L, 15 * MIN), (9L, 600 * MIN))
          .toDF("user_id", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(batch == got :+ ((9L, 600 * MIN, 630 * MIN, 1L)))
  }

  test("MG sketch state folded per micro-batch keeps the whole-stream bound") {
    // the q_stream_topk maintenance loop, driven through the MULTI-batch
    // path the single-file oracle drain can't reach: each batch reduces
    // to one k-counter summary, the driver folds it into running state
    // with the mergeable-summaries merge, and the N/(k+1) bound must
    // hold against the UNION of all batches (associativity of the
    // merge — the whole point of maintaining a sketch as state).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val K = 8
    val ms = MemoryStream[String]
    var state = Seq.empty[(String, Long)]
    var n = 0L
    val q = ms.toDF().toDF("item").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = batch.agg(
          graft.functions.MisraGries.mgTopK(col("item"), K).as("sk"),
          count(col("item")).as("bn")).collect()(0)
        state = graft.functions.MisraGries.mergeSummaries(state,
          r.getSeq[org.apache.spark.sql.Row](0)
            .map(x => x.getString(0) -> x.getLong(1)), K)
        n += r.getLong(1)
        ()
      }
      .outputMode("update").start()
    def skewed(lo: Int, hi: Int): Seq[String] = (lo until hi).map { i =>
      if (i % 4 < 2) s"h${i % 2}"
      else if (i % 4 == 2) s"m${i % 16}" else s"c$i"
    }
    val batches = Seq(skewed(0, 1000), skewed(1000, 2500), skewed(2500, 4000))
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    val exact = batches.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val bound = n.toDouble / (K + 1)
    val sk = state.toMap
    assert(n == 4000L)
    assert(sk.size <= K)
    sk.foreach { case (w, est) =>
      val t = exact.getOrElse(w, 0L)
      assert(est <= t, s"$w: est $est exceeds true $t")
      assert(t - est <= bound, s"$w: underestimate ${t - est} > $bound")
    }
    exact.foreach { case (w, t) =>
      if (t > bound) assert(sk.contains(w), s"heavy hitter $w missing")
    }
  }

  test("drift count fold is batching-invariant and equals the batch count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // same logical rows, two different batchings → identical state
    val rows = (0 until 300).map(i => (s"t${i % 3}", (i % 7).toLong))
    def foldWith(batching: Seq[Seq[(String, Long)]]): Map[(String, Long), Long] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-fold")
        .toFile.getAbsolutePath + "/st"
      val ms = MemoryStream[(String, Long)]
      val q = ms.toDS().toDF("event_type", "bin")
        .writeStream.outputMode("append")
        .foreachBatch(graft.operators.StreamingGate.foldBinCounts(dir) _)
        .start()
      batching.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      spark.read.parquet(dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val oneShot = foldWith(Seq(rows))
    val staggered = foldWith(Seq(rows.take(50), rows.slice(50, 51),
      rows.slice(51, 220), rows.drop(220)))
    assert(oneShot == staggered, "fold must be batching-invariant")
    val exact = rows.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    assert(oneShot == exact, "folded state must equal the batch count")
  }

  test("freshness (MAX, SUM) fold is batching-invariant and exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 300).map(i => (s"t${i % 3}", (i * 37 % 1000).toLong))
    def foldWith(batching: Seq[Seq[(String, Long)]])
        : Map[String, (Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-maxfold")
        .toFile.getAbsolutePath + "/st"
      val ms = MemoryStream[(String, Long)]
      val q = ms.toDS().toDF("event_type", "us")
        .writeStream.outputMode("append")
        .foreachBatch(graft.operators.StreamingGate.foldTypeMax(dir) _)
        .start()
      batching.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      spark.read.parquet(dir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val oneShot = foldWith(Seq(rows))
    val staggered = foldWith(Seq(rows.take(7), rows.slice(7, 150),
      rows.drop(150)))
    assert(oneShot == staggered, "max/sum fold must be batching-invariant")
    val exact = rows.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.map(_._2).max, xs.size.toLong)
    }
    assert(oneShot == exact)
  }

  test("KLL sketch fold across micro-batches: count conserved, median in the rank window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val K = 200
    val dir = java.nio.file.Files.createTempDirectory("kllfold").toString + "/st"
    // 1500 skewed values arriving in three uneven batches (one empty —
    // the null-sketch guard path)
    val values = (1L to 1500L).map(i => (i * i) % 997)
    val ms = MemoryStream[Long]
    val q = ms.toDS().toDF("cents")
      .writeStream.outputMode("append")
      .foreachBatch(graft.operators.StreamingGate.foldKll(dir, K) _)
      .start()
    Seq(values.take(100), Seq.empty[Long], values.drop(100)).foreach { b =>
      if (b.nonEmpty) ms.addData(b)
      q.processAllAvailable()
    }
    q.stop()
    val st = spark.read.parquet(dir)
      .select(expr("kll_sketch_get_quantile_bigint(sk, 0.5)").as("med"),
        col("n")).collect()(0)
    assert(st.getLong(1) == values.length.toLong,
      "folded count must equal the stream size across batches")
    val med = st.getLong(0)
    val below = values.count(_ < med)
    val atOrBelow = values.count(_ <= med)
    val eps = 2.296 / math.pow(K.toDouble, 0.9)
    val band = 2.0 * eps * values.length
    assert(atOrBelow >= values.length * 0.5 - band &&
      below + 1 <= values.length * 0.5 + band,
      s"median $med outside the rank window (below=$below at_or_below=$atOrBelow)")
  }

  test("zone-map (MIN,MAX,SUM) fold is batching-invariant and equals the one-shot aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 400).map(i =>
      ((i * 13 % 7).toLong, (i * 31 % 256).toLong, (i * 17 % 30 + 11).toLong))
    def foldWith(batching: Seq[Seq[(Long, Long, Long)]])
        : Map[Long, (Long, Long, Long, Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-zmfold")
        .toFile.getAbsolutePath + "/zm"
      val ms = MemoryStream[(Long, Long, Long)]
      val q = ms.toDS().toDF("zcell", "a", "b")
        .writeStream.outputMode("append")
        .foreachBatch(graft.operators.StreamingGate.foldZoneMap(dir) _)
        .start()
      batching.foreach { b => if (b.nonEmpty) ms.addData(b); q.processAllAvailable() }
      q.stop()
      spark.read.parquet(dir).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    }
    val oneShot = foldWith(Seq(rows))
    val staggered = foldWith(Seq(rows.take(13), Seq.empty, rows.slice(13, 200),
      rows.drop(200)))
    assert(oneShot == staggered, "zone-map fold must be batching-invariant")
    val exact = rows.groupBy(_._1).map { case (c, xs) =>
      c -> (xs.map(_._2).min, xs.map(_._2).max,
        xs.map(_._3).min, xs.map(_._3).max, xs.size.toLong)
    }
    assert(oneShot == exact)
  }

  test("KLL fold with an all-empty prefix: count stays 0 (not NULL), then recovers exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two consecutive empty folds: the state row's sketch is NULL both
    // times, so a row-level isNotNull filter would empty the merge agg
    // and turn n NULL — the FILTER-clause scoping keeps n summing
    val dir = java.nio.file.Files.createTempDirectory("kllempty").toString + "/st"
    def fold(xs: Seq[Long]): Unit =
      graft.operators.StreamingGate.foldKll(dir, 200)(
        xs.toDF("cents"), 0L)
    fold(Seq.empty)
    fold(Seq.empty)
    val mid = spark.read.parquet(dir).select(col("n")).collect()(0)
    assert(!mid.isNullAt(0) && mid.getLong(0) == 0L,
      "an all-empty history must fold to n=0, never NULL")
    fold(Seq(1L, 2L, 3L))
    fold(Seq.empty)
    val fin = spark.read.parquet(dir)
      .select(expr("kll_sketch_get_quantile_bigint(sk, 0.5)").as("med"),
        col("n")).collect()(0)
    assert(fin.getLong(1) == 3L && fin.getLong(0) == 2L,
      "real data arriving after the empty prefix must fold exactly")
  }

  test("HLL fold is batching-invariant and exact in sparse mode") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the mergeable-summary family contract, cardinality member: the
    // final state must not depend on how the stream was batched, and
    // below 2^lgK distinct keys the sketch is in exact sparse mode so
    // the estimate IS the true distinct
    val users = (0L until 300L).map(i => i % 97)
    def foldWith(batching: Seq[Seq[Long]]): (Long, Long) = {
      val dir = java.nio.file.Files.createTempDirectory("hllfold")
        .toFile.getAbsolutePath + "/hs"
      batching.zipWithIndex.foreach { case (b, i) =>
        graft.operators.StreamingGate.foldHll(dir, 12)(
          b.toDF("user_id"), i.toLong)
      }
      val r = spark.read.parquet(dir)
        .select(expr("cast(round(hll_sketch_estimate(sk)) as bigint)"),
          col("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val oneShot = foldWith(Seq(users))
    val staggered = foldWith(Seq(users.take(7), Seq.empty,
      users.slice(7, 150), users.drop(150)))
    assert(oneShot == staggered, "HLL fold must be batching-invariant")
    assert(oneShot == ((97L, 300L)),
      s"sparse-mode sketch must be exact: $oneShot, want (97, 300)")
  }

  test("gram-set fold is batching-invariant (set union is the monoid)") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11} shared tail"))
    def foldWith(batching: Seq[Seq[(Long, String)]]): Set[(String, String)] = {
      val dir = java.nio.file.Files.createTempDirectory("gramfold")
        .toFile.getAbsolutePath + "/gs"
      batching.zipWithIndex.foreach { case (b, i) =>
        graft.operators.StreamingGate.foldGramSet(dir)(
          b.toDF("doc_id", "text"), i.toLong)
      }
      spark.read.parquet(dir).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    }
    val oneShot = foldWith(Seq(docs))
    val staggered = foldWith(Seq(docs.take(9), Seq.empty,
      docs.slice(9, 40), docs.drop(40)))
    assert(oneShot == staggered, "gram-set fold must be batching-invariant")
    assert(oneShot.nonEmpty && oneShot.map(_._1).subsetOf(
      Set("train", "val", "test")))
  }

  test("media-gate fold: batching-invariant, real decode matches the analytic contract") {
    import spark.implicits._
    val ids = (0L until 60L)
    def foldWith(batching: Seq[Seq[Long]]): Map[String, Long] = {
      val dir = java.nio.file.Files.createTempDirectory("mediagate")
        .toFile.getAbsolutePath + "/mg"
      batching.zipWithIndex.foreach { case (b, i) =>
        graft.operators.StreamingGate.foldMediaGate(dir)(
          b.toDF("doc_id"), i.toLong)
      }
      spark.read.parquet(dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val oneShot = foldWith(Seq(ids))
    val staggered = foldWith(Seq(ids.take(9), Seq.empty,
      ids.slice(9, 40), ids.drop(40)))
    assert(oneShot == staggered, "media-gate fold must be batching-invariant")
    // the REAL decode under the fold must reproduce the analytic
    // contract: truncation plant by image key, dims by formula
    val media = ids.flatMap(d =>
      if (d % 17 == 4) Seq((d, d), (d + 1000000L, d)) else Seq((d, d)))
    def reason(img: Long, src: Long): String =
      if (img % 29 == 5) "undecodable"
      else if (math.min(8 + src % 9, 8 + src % 7) < 10) "too_small"
      else "ok"
    val expect = media.groupBy { case (img, src) => reason(img, src) }
      .view.mapValues(_.size.toLong).toMap
    assert(oneShot == expect, s"got $oneShot want $expect")
    assert(expect.keySet == Set("ok", "too_small", "undecodable"),
      "a verdict class is silent on this fixture")
  }

  test("bm25-stats fold is batching-invariant and equals a plain-Scala stat recompute") {
    import spark.implicits._
    val terms = Seq("alpha", "beta")
    val docs = (0L until 40L).map { i =>
      (i, (Seq.fill((i % 4).toInt)("alpha") ++ Seq.fill((i % 3).toInt)("beta")
        ++ Seq("pad", s"w$i")).mkString(" "))
    }
    def foldWith(batching: Seq[Seq[(Long, String)]]): Seq[Long] = {
      val dir = java.nio.file.Files.createTempDirectory("bm25fold")
        .toFile.getAbsolutePath + "/bs"
      batching.zipWithIndex.foreach { case (b, i) =>
        graft.operators.StreamingGate.foldBm25Stats(dir, terms)(
          b.toDF("doc_id", "text"), i.toLong)
      }
      val r = spark.read.parquet(dir).collect()
      assert(r.length == 1, "stats state must stay one row")
      (0 until 4).map(r(0).getLong)
    }
    val oneShot = foldWith(Seq(docs))
    val staggered = foldWith(Seq(docs.take(7), Seq.empty,
      docs.slice(7, 25), docs.drop(25)))
    assert(oneShot == staggered, "stats fold must be batching-invariant")
    // independent recompute: whitespace tokens, dl = token count,
    // df = docs containing the term at least once
    val toks = docs.map { case (_, t) => t.split(" ").filter(_.nonEmpty) }
    val expect = Seq(
      docs.length.toLong,
      toks.map(_.length.toLong).sum,
      toks.count(_.contains("alpha")).toLong,
      toks.count(_.contains("beta")).toLong)
    assert(oneShot == expect, s"got $oneShot want $expect")
  }

  test("gram-theta fold: batching-invariant, exact in sparse mode, A-not-B novelty matches a plain-Scala recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0L until 60L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11} shared tail"))
    def foldWith(batching: Seq[Seq[(Long, String)]])
        : Map[String, (Long, Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("gramtheta")
        .toFile.getAbsolutePath + "/ts"
      batching.zipWithIndex.foreach { case (b, i) =>
        graft.operators.StreamingGate.foldGramTheta(dir, 12)(
          b.toDF("doc_id", "text"), i.toLong)
      }
      val st = spark.read.parquet(dir)
      val train = st.filter(col("split") === "train")
        .select(col("sk").as("tsk"))
      st.crossJoin(broadcast(train))
        .select(col("split"),
          expr("theta_sketch_estimate(sk)").as("est"),
          expr("theta_sketch_estimate(theta_difference(sk, tsk))")
            .as("novel"),
          col("n_docs")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    }
    val oneShot = foldWith(Seq(docs))
    val staggered = foldWith(Seq(docs.take(9), Seq.empty,
      docs.slice(9, 40), docs.drop(40)))
    assert(oneShot == staggered, "theta fold must be batching-invariant")
    // independent plain-Scala recompute of the split rule (md5 hex
    // bucket) and the distinct word trigrams per split — below 2^12
    // distinct grams the sketch is in exact mode, so estimates must
    // EQUAL the exact counts, and the A-not-B difference must equal
    // the exact novel-gram count (not just land in a band)
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      val b = java.lang.Long.parseLong(hex, 16)
      if (b < 58982) "train" else if (b < 62259) "val" else "test"
    }
    def gramsOf(text: String): Set[String] = {
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val bySplit = docs.groupBy { case (id, _) => splitOf(id) }
    val exactSets = bySplit.view
      .mapValues(_.flatMap { case (_, t) => gramsOf(t) }.toSet).toMap
    val trainSet = exactSets.getOrElse("train", Set.empty)
    oneShot.foreach { case (split, (est, novel, nDocs)) =>
      assert(est == exactSets(split).size.toLong,
        s"$split: sparse-mode estimate must be exact")
      assert(novel == (exactSets(split) -- trainSet).size.toLong,
        s"$split: A-not-B must equal the exact novel count")
      assert(nDocs == bySplit(split).size.toLong,
        s"$split: doc-count conservation")
    }
    assert(oneShot.keySet == Set("train", "val", "test"))
    assert(oneShot.exists { case (s, (_, novel, _)) =>
      s != "train" && novel > 0 }, "plant is vacuous: no novel grams")
  }

  test("dim-moment fold is batching-invariant (sum monoid on the dim grid)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new java.util.Random(5)
    val rows = (0L until 90L).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    def foldWith(batching: Seq[Seq[(Long, Seq[Double])]]): Set[(Long, Long, String, String)] = {
      val dir = java.nio.file.Files.createTempDirectory("dimfold")
        .toFile.getAbsolutePath + "/dm"
      batching.zipWithIndex.foreach { case (b, i) =>
        graft.operators.StreamingGate.foldDimMoments(dir)(
          b.toDF("vec_id", "embedding"), i.toLong)
      }
      spark.read.parquet(dir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString,
          r.getDecimal(3).toPlainString)).toSet
    }
    val oneShot = foldWith(Seq(rows))
    val staggered = foldWith(Seq(rows.take(11), Seq.empty,
      rows.slice(11, 60), rows.drop(60)))
    assert(oneShot == staggered, "dim-moment fold must be batching-invariant")
    assert(oneShot.size == 8 && oneShot.forall(_._2 == 90L))
  }

  test("foldKllIdem skips a replayed batch id and merges a fresh one exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the death-after-swap-before-commit window: the restarted stream
    // re-delivers the last batch; the fold must treat ids ≤ last_id as
    // already merged (a re-merge would double-count every row) while
    // still folding the NEXT id
    val dir = java.nio.file.Files.createTempDirectory("kllidem").toString + "/st"
    def fold(xs: Seq[Long], id: Long): Unit =
      graft.operators.StreamingGate.foldKllIdem(dir, 200)(
        xs.toDF("cents"), id)
    fold(Seq(1L, 2L, 3L), 0L)
    fold(Seq(4L, 5L), 1L)
    fold(Seq(4L, 5L), 1L) // the replay — must be a no-op
    fold(Seq(1L, 2L, 3L), 0L) // an older id replayed — also a no-op
    fold(Seq(6L), 2L)
    val fin = spark.read.parquet(dir)
      .select(col("n"), col("last_id")).collect()(0)
    assert(fin.getLong(0) == 6L,
      s"replays double-folded: n=${fin.getLong(0)}, want 6")
    assert(fin.getLong(1) == 2L)
  }

  // ---- swapState crash windows (r9): every gap in the write-tmp →
  // rename-aside → rename-in → drop-aside sequence must leave the
  // monitor recoverable. A crash is simulated by reproducing the
  // exact on-disk layout the window leaves behind, then running the
  // next fold as a restart would.

  private def readState(dir: String): Map[String, (Long, Long)] =
    spark.read.parquet(dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def foldOnce(dir: String, rows: (String, Long)*): Unit = {
    import spark.implicits._
    graft.operators.StreamingGate.foldTypeMax(dir)(
      rows.toSeq.toDF("event_type", "us"), 0L)
  }

  test("crash between rename-aside and rename-in: the next fold resumes from the aside copy") {
    val root = java.nio.file.Files.createTempDirectory("swapcrash").toString
    val dir = root + "/st"
    foldOnce(dir, ("a", 10L), ("a", 20L), ("b", 5L))
    // simulate the crash window: state was renamed aside, tmp never
    // landed — the layout the old delete-before-rename code turned
    // into total state loss
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + "_old")))
    assert(!new java.io.File(dir).exists())
    foldOnce(dir, ("b", 50L))
    // prior state must have been recovered, not rebuilt from the batch
    assert(readState(dir) == Map("a" -> (20L, 2L), "b" -> (50L, 2L)))
    assert(!new java.io.File(dir + "_old").exists(),
      "a successful swap clears the aside copy")
  }

  test("crash after rename-in but before aside cleanup: live state wins over the stale aside") {
    val root = java.nio.file.Files.createTempDirectory("swapcrash2").toString
    val dir = root + "/st"
    foldOnce(dir, ("a", 10L))
    // plant a STALE aside (an older state) next to the live dir — the
    // post-success crash window; recovery must NOT clobber live state
    foldOnce(dir + "_old", ("a", 1L))
    foldOnce(dir, ("a", 30L))
    assert(readState(dir) == Map("a" -> (30L, 2L)),
      "recovery must prefer the live state dir over a stale aside")
    assert(!new java.io.File(dir + "_old").exists())
  }

  test("the q_stream_topk sketch writer survives the rename window (no delete-before-rename remains)") {
    // the r8 verdict's one surviving unsafe site: grep-level pin that
    // main source has no deleteRec(stateDir)-then-rename pattern left,
    // plus a behavioral check through the shared swap on the sketch
    // frame shape (item, est, n)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/operators/StreamingGate.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val unsafe = "deleteRec(dir)"
    assert(!text.contains(unsafe),
      "state writers must go through swapState, not delete-before-rename")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("swapcrash3").toString
    val dir = root + "/sk"
    graft.operators.StreamingGate.swapState(
      Seq(("hot_1", 9L, 12L)).toDF("item", "est", "n"), dir)
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + "_old")))
    graft.operators.StreamingGate.recoverState(dir)
    assert(readState(dir) == Map("hot_1" -> (9L, 12L)))
  }
}
