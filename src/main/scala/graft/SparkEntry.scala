package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator pack's query registry. Each key has a Spark
  * implementation in `queries` and (where SQL-expressible) an equivalent
  * DuckDB oracle in `oracleSql`; the driver hash-compares both at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's ingestion slice: anti-join dedup → broadcast dim
    * enrichment → blocklist filter → computed projection (SURVEY.md §7.1).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.ingest(spark, "/root/testdata/sf0.001")

  private val packs: Seq[QueryPack] =
    Seq(Relational, TextAnalytics, Dedup, Similarity, Multimodal, Topics,
      Scalars, Analytic, Extras, Pipeline, StreamingGate, Sketches,
      Discovery, Inference, Curation)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries.toSeq)
    require(all.size == all.map(_._1).distinct.size,
      s"duplicate query names across packs: " +
        all.groupBy(_._1).filter(_._2.size > 1).keys.mkString(", "))
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_.oracles).reduce(_ ++ _)
}

/** An operator family contributing queries + oracles to the registry. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
