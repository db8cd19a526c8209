package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Storage-layout scale techniques: bucketed co-located joins (no
  * shuffle at join time) and partitioned writes with partition pruning.
  * These are the 100-TB layouts the operator packs assume; asserted here
  * on the real testdata written back through the layouts. */
class StorageLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    // (spark.sql.warehouse.dir is static — managed tables land in
    // ./spark-warehouse; DROP TABLE below removes the data.)
    val o = Tables(spark, TestSpark.sf, "orders")
    val c = Tables(spark, TestSpark.sf, "customer")
    o.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_b")
    c.write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_b")
    // disable auto-broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b").join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("partitioned write + partition pruning reaches the scan") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_part").toString + "/events_p"
    Tables(spark, TestSpark.sf, "events")
      .withColumn("etype", col("event_type"))
      .write.mode("overwrite").partitionBy("etype").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("etype") === "error")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("etype"),
      scan.take(2000))
    val full = Tables(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "error").count()
    assert(q.count() == full)
  }

  test("binaryFile source reads opaque payloads with metadata (S9)") {
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(TestSpark.sf)
    val rows = df.select("path", "length").collect()
    assert(rows.length == 10) // one per testdata table
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("append sink accumulates batches (K2)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_append").toString + "/t"
    val r = Tables(spark, TestSpark.sf, "region")
    r.write.mode("append").parquet(dir)
    r.write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 2 * r.count())
  }

  test("schema evolution: mergeSchema unions drifted parquet batches") {
    // at 100 TB ingest runs for months; late batches grow columns. The
    // reader must union schemas and null-fill old batches, not fail.
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    val r = Tables(spark, TestSpark.sf, "region")
    r.select(col("r_regionkey"), col("r_name")).write.mode("append").parquet(dir)
    r.select(col("r_regionkey"), col("r_name"),
        lit("v2").as("ingest_version")) // new column in a later batch
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet ==
      Set("r_regionkey", "r_name", "ingest_version"))
    assert(merged.count() == 2 * r.count())
    // old batch rows surface with nulls in the new column
    assert(merged.filter(col("ingest_version").isNull).count() == r.count())
  }

  test("CSV round-trip with explicit schema and filter pushdown") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_csv").toString + "/t"
    val n = Tables(spark, TestSpark.sf, "nation")
    n.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(n.schema).csv(dir)
    assert(back.schema == n.schema) // no type loss with an explicit schema
    assert(back.count() == n.count())
    val filtered = back.filter(col("n_regionkey") === 0)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,0)]"),
      plan.take(1500))
  }

  test("JSON lines round-trip preserves nested structs (S3/S4 payload shape)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_json").toString + "/t"
    val nested = Tables(spark, TestSpark.sf, "nation")
      .select(col("n_nationkey"),
        struct(col("n_name").as("name"),
          struct(col("n_regionkey").as("key")).as("region")).as("meta"))
    nested.write.json(dir)
    val back = spark.read.schema(nested.schema).json(dir)
    assert(back.select("meta.region.key").distinct().count() ==
      nested.select("meta.region.key").distinct().count())
    assert(back.count() == nested.count())
  }
}
