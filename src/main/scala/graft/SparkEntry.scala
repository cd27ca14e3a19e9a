package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the judged operator surface (SURVEY.md §2): Part-A
  * ingestion operators, Part-B relational algebra, event/stream
  * analytics, and the LLM-pipeline extension (text dedup, similarity
  * search). Every entry with SQL-expressible semantics carries a DuckDB
  * oracle in `oracleSql`; approximate/hash-dependent ops (HLL, MinHash,
  * SimHash, LSH) are rows-only and verified by unit tests instead.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    Flagship.defs ++ IngestQueries.defs ++ Relational.defs ++ Relational2.defs ++
      Relational3.defs ++ Relational4.defs ++ EventQueries.defs ++ EventQueries2.defs ++
      TextQueries.defs ++ TextQueries2.defs ++ TextQueries3.defs ++ TextQueries4.defs ++ TextQueries5.defs ++
      VectorQueries.defs ++ VectorQueries2.defs ++ MaintenanceQueries.defs ++ CurationQueries.defs ++
      RetrievalQueries.defs ++ TokenizerQueries.defs ++ UnigramQueries.defs ++
      WordpieceQueries.defs ++ SpectralQueries.defs ++ KmeansQueries.defs ++
      AnalyticsQueries.defs ++ PackingQueries.defs ++ LmQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
