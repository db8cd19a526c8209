package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Core relational operator pack.
  *
  * Mirrors the reference's dataflow operators (SURVEY.md §2) re-expressed
  * as declarative Spark plans over the TPC-H-ish testdata:
  *   - computed-column projections with defaulting (P1-P8 analogs,
  *     reference posts-from-hashtags.js:67-78)
  *   - blocklist filter (F1, posts-from-hashtags.js:236-289)
  *   - existence anti-join dedup (F5/J1, posts-from-hashtags.js:295-300)
  *   - left-outer dim enrichment (J2, posts-from-hashtags.js:143-195)
  *   - inner enrichment join (J3, posts-from-hashtags.js:197-234)
  *   - top-k (A5+A6, extend-followers.js:84-92), per-group top-k (A4)
  *   - union-with-source (A8, posts-from-hashtags.js:365-379)
  *   - upsert-as-merge (K1, posts-from-hashtags.js:346-348)
  *   - delete-as-anti-join (K3, extend-followers.js:116)
  *
  * Scale notes: dimension sides of joins are explicitly `broadcast()`;
  * money math is done in exact DECIMAL so results are order-independent
  * (a distributed sum of doubles is not reproducible across partition
  * counts — decimals are). Final outputs cast back to DOUBLE.
  */
object Relational extends graft.QueryPack {

  /** Exact 2-decimal money type: sums are associative → identical results
    * on any partitioning, and identical to the DuckDB oracle. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(4, 2))
  private def sumMoney(c: Column): Column = sum(dec(c)).cast("double")

  /** Blocklisted supplier keys — the F1 analog (49-name username blocklist
    * in the reference; small enough to inline / broadcast). */
  val blockedSuppliers: Seq[Long] = Seq(3L, 7L)

  /** MERGE-style upsert rewrite (K1): keep target rows whose key is absent
    * from updates, then union the updates — last-writer-wins per key,
    * exactly `findOneAndUpdate({id}, doc, {upsert:true})` set semantics.
    * Scale: NO broadcast hint baked into the helper — an incremental
    * micro-batch update set broadcasts (AQE does it under the
    * threshold), but a bulk backfill is the BIG side of this join and a
    * hard-coded hint would force-collect it to the driver (the exact
    * reason Pipeline's merge stage is unhinted). Call sites that KNOW
    * their update side is bounded can wrap it in broadcast() themselves.
    */
  def merge(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target.join(updates, Seq(key), "left_anti")
      .unionByName(updates)

  /** Delete-by-key rewrite (K3). Unhinted like [[merge]]: a delete set
    * derived from a fact-table slice grows with the data; AQE
    * broadcasts the distinct key set only while it fits. */
  def deleteByKey(target: DataFrame, dead: DataFrame, key: String): DataFrame =
    target.join(dead.select(key).distinct(), Seq(key), "left_anti")

  // ---------------------------------------------------------------------
  // Flagship: the reference's ingestion slice (SURVEY.md §7.1) —
  // new-batch anti-join dedup → dim enrichment → blocklist → projection.
  // ---------------------------------------------------------------------
  def ingest(spark: SparkSession, dir: String): DataFrame = {
    val incoming = Tables(spark, dir, "lineitem")
    val seen = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val supplier = Tables(spark, dir, "supplier")

    incoming
      .join(seen, incoming("l_orderkey") === seen("o_orderkey"), "left_anti")
      // supplier grows with SF (a fact-side dim, not nation/region):
      // unhinted, AQE broadcasts while it fits
      .join(supplier, incoming("l_suppkey") === supplier("s_suppkey"))
      .filter(!col("s_suppkey").isin(blockedSuppliers: _*))
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        concat(lit("https://posts/"), col("l_orderkey"), lit("/"),
          col("l_linenumber")).as("permalink"),
        col("l_quantity"),
        (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) -
          dec4(col("l_discount")))).cast("double").as("revenue"),
        col("s_name"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("X")).as("flag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val ingestSql: String =
    """SELECT l.l_orderkey,
      |       CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
      |       'https://posts/' || l.l_orderkey || '/' || l.l_linenumber AS permalink,
      |       l.l_quantity,
      |       CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
      |            (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
      |            AS DOUBLE) AS revenue,
      |       s.s_name,
      |       COALESCE(NULLIF(l.l_returnflag, 'N'), 'X') AS flag
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_orderstatus = 'F' AND o.o_orderkey = l.l_orderkey)
      |  AND s.s_suppkey NOT IN (3, 7)
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  // ---------------------------------------------------------------------
  // Query registry
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ingest_dedup" -> ((s, d) => ingest(s, d)),

    // A1-style hash aggregation with exact decimal money math.
    "q1_agg" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumMoney(col("l_quantity")).as("sum_qty"),
          sumMoney(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) -
            dec4(col("l_discount")))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          (sumMoney(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P1 analog: computed-column projection (concat permalink, defaulting).
    "q_proj_computed" -> ((s, d) => {
      Tables(s, d, "orders").select(
        col("o_orderkey"),
        concat(lit("https://orders/"), col("o_orderkey"), lit("/")).as("permalink"),
        upper(col("o_orderstatus")).as("status"),
        coalesce(nullif(col("o_orderpriority"), lit("3-MEDIUM")), lit("OTHER")).as("priority"),
        (dec(col("o_totalprice")) * lit(2)).cast("double").as("double_price"))
        .orderBy(col("o_orderkey"))
    }),

    // F1/J7: blocklist filter (NOT IN small static list).
    "q_filter_blocklist" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .filter(!col("l_suppkey").isin(blockedSuppliers: _*))
        .groupBy(col("l_suppkey")).agg(
          count(lit(1)).as("n"),
          sumMoney(col("l_extendedprice")).as("total"))
        .orderBy(col("l_suppkey"))
    }),

    // J1/F5: existence anti-join (the reference's core dedup operator).
    "q_anti_join_dedup" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Semi-join complement of the above.
    "q_semi_join" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J2: left-outer enrichment against a dim, with null defaulting.
    "q_left_outer_enrich" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      // customer scales with SF — unhinted (AQE broadcasts while it fits)
      o.join(c, o("o_custkey") === c("c_custkey"), "left_outer")
        .select(
          col("o_orderkey"),
          coalesce(col("c_name"), lit("unknown")).as("customer_name"),
          coalesce(col("c_mktsegment"), lit("NONE")).as("segment"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // J3: multi-way inner enrichment; dims broadcast; revenue per nation.
    "q_inner_enrich" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      val n = Tables(s, d, "nation")
      val r = Tables(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        // customer scales with SF — unhinted; nation/region are true
        // fixed dims (25/5 rows at any scale) and keep their hints
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) -
          dec4(col("l_discount")))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // A5+A6: global top-k → TakeOrderedAndProject (no full sort at scale).
    "q_topk" -> ((s, d) => {
      Tables(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    }),

    // A4: per-group top-k via window (reference: top-7 topic terms).
    "q_topk_per_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables(s, d, "part")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("p_brand"), col("rk"), col("p_partkey"), col("p_retailprice"))
        .orderBy(col("p_brand"), col("rk"))
    }),

    // A8: union of per-source batches with a provenance column.
    "q_union_source" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("source", lit("urgent"))
      val high = o.filter(col("o_orderpriority") === "2-HIGH")
        .withColumn("source", lit("high"))
      urgent.unionByName(high)
        .select(col("source"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"), col("source"))
    }),

    // K1: MERGE-style upsert (anti-join ∪ updates).
    "q_merge_upsert" -> ((s, d) => {
      val target = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = Tables(s, d, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (dec(col("o_totalprice")) + lit(1)).cast("double").as("o_totalprice"))
      merge(target, updates, "o_orderkey").orderBy(col("o_orderkey"))
    }),

    // K3: delete-by-key as anti-join.
    "q_delete_antijoin" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val dead = o.filter(col("o_orderstatus") === "F")
      deleteByKey(o, dead, "o_orderkey")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // F2 shape: null-field predicate over a left join's miss side.
    "q_null_filter_join" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .filter(col("o_custkey").isNull)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // S2 analog: JSON field extraction (from embedded-JSON scraping).
    "q_json_extract" -> ((s, d) => {
      Tables(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("event_type"))
        .filter(col("k") > 50)
        .orderBy(col("event_id"))
    }),

    // Event-time tumbling window aggregation (batch form of ST slice).
    "q_window_time" -> ((s, d) => {
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("total"))
        // epoch µs, not a timestamp column: every temporal output is a
        // BIGINT so the driver's compare never sees engine-specific
        // timestamp precision/zone encodings
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"), col("total"))
        .orderBy(col("window_start_us"), col("event_type"))
    }),

    // Sliding event-time windows (2h window, 1h slide): each event lands
    // in two windows; the oracle enumerates the same two candidate
    // starts per event.
    "q_window_sliding" -> ((s, d) => {
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("total"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"), col("total"))
        .orderBy(col("window_start_us"), col("event_type"))
    }),

    // ST5/K1: latest-event-per-key dedup (row_number over recency).
    "q_latest_per_key" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(s, d, "events")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_ingest_dedup" -> ingestSql,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |       (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_proj_computed" ->
      """SELECT o_orderkey,
        |  'https://orders/' || o_orderkey || '/' AS permalink,
        |  UPPER(o_orderstatus) AS status,
        |  COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'OTHER') AS priority,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DOUBLE) AS double_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_filter_blocklist" ->
      """SELECT l_suppkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM lineitem WHERE l_suppkey NOT IN (3, 7)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_anti_join_dedup" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_left_outer_enrich" ->
      """SELECT o_orderkey,
        |  COALESCE(c_name, 'unknown') AS customer_name,
        |  COALESCE(c_mktsegment, 'NONE') AS segment,
        |  o_totalprice
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_inner_enrich" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |       (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_topk_per_group" ->
      """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) t
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,

    "q_union_source" ->
      """SELECT source, o_orderkey, o_totalprice FROM (
        |  SELECT 'urgent' AS source, o_orderkey, o_totalprice FROM orders
        |    WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT 'high' AS source, o_orderkey, o_totalprice FROM orders
        |    WHERE o_orderpriority = '2-HIGH') t
        |ORDER BY o_orderkey, source""".stripMargin,

    "q_merge_upsert" ->
      """WITH updates AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1 AS DOUBLE) AS o_totalprice
        |  FROM orders WHERE o_orderstatus = 'O')
        |SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders t
        |  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = t.o_orderkey)
        |  UNION ALL
        |  SELECT * FROM updates) m
        |ORDER BY o_orderkey""".stripMargin,

    "q_delete_antijoin" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders t
        |WHERE NOT EXISTS (SELECT 1 FROM orders d
        |                  WHERE d.o_orderstatus = 'F' AND d.o_orderkey = t.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_null_filter_join" ->
      """SELECT c_custkey, c_name
        |FROM customer c LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
        |                           WHERE o_orderpriority = '1-URGENT') o
        |  ON c.c_custkey = o.o_custkey
        |WHERE o.o_custkey IS NULL
        |ORDER BY c_custkey""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  event_type
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,

    "q_window_time" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_sliding" ->
      """SELECT epoch_us(ws) AS window_start_us, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT event_type, value,
        |    unnest([date_trunc('hour', ts),
        |            date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
        |  FROM events) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_latest_per_key" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events) t
        |WHERE rk = 1 ORDER BY user_id""".stripMargin
  )
}
