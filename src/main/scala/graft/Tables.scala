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

  /** Deterministic hash repartition sized by the session's
    * defaultParallelism, for CPU-HEAVY narrow work whose input frame
    * arrives with fewer partitions than cores — a row-group-capped
    * small parquet scan, or an AQE-coalesced tiny-bytes exchange
    * (AQE sizes partitions by bytes; it cannot see that each row
    * carries an expensive fold/decode). Guide §2.5: "repartition
    * immediately after the read". The key must be high-cardinality
    * (≫ partitions) and the computation per-row, so results are
    * partition-invariant (DeterminismSpec's standing gate). At
    * cluster scale the input usually already has ≥ parallelism
    * partitions and this is one cheap narrow-row exchange before the
    * expensive per-row work — never a payload reshuffle. */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") {
      // events.ts has shipped as parquet INT64 TIMESTAMP(NANOS) in some
      // testdata generations (Spark refuses to read nanos natively) and as
      // plain TIMESTAMP(MICROS) [isAdjustedToUTC=false → TIMESTAMP_NTZ] in
      // others. Normalize both to a session-TZ (UTC) TimestampType so every
      // downstream unix_micros/window expression sees one type, matching
      // DuckDB's TIMESTAMP read of the same file.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType => // raw nanos → truncate to micros (DuckDB ns→µs behavior)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => // exact under the UTC session timezone
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType => raw
        case other => sys.error(s"unexpected events.ts type: $other")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
