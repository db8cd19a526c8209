package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata loaders (see TESTDATA.md).
  *
  * Every query reads through here so scan behavior is uniform: plain
  * parquet scans that Catalyst can prune columns from and push filters
  * into (`PushedFilters` / `ReadSchema` in `.explain("formatted")`).
  *
  * At cluster scale these single files become partitioned/bucketed table
  * roots; nothing downstream assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") {
      // events.ts is parquet INT64 TIMESTAMP(NANOS) which Spark refuses to
      // read natively; read the raw nanos and downcast to a micros
      // timestamp (truncation — matches DuckDB's ns→µs read behavior).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
