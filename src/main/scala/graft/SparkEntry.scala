package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every operator family contributes a `queries` map (name →
  * DataFrame builder) and, where DuckDB can express the same
  * semantics, an `oracle` map with IDENTICAL column aliases (the
  * driver sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the clean-corpus composite — quality scoring → near-dup
    * clustering → representative selection, the end-to-end product of
    * the text/dedup operator families. */
  def entry(spark: SparkSession): DataFrame =
    CorpusOps.cleanCorpus(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ EtlOps.queries ++ DedupOps.queries ++
      AnnOps.queries ++ TextOps.queries ++ VocabOps.queries ++
      MultimodalOps.queries ++
      IngestOps.queries ++ CorpusOps.queries ++ Upsert.queries ++
      PipelineOps.queries ++ ReferencePipeline.queries ++ GraphOps.queries ++
      graft.streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver's rows-only check
    * (those operators are ScalaTest-verified instead). */
  def oracleSql: Map[String, String] =
    RelationalOps.oracle ++ EtlOps.oracle ++ DedupOps.oracle ++
      AnnOps.oracle ++ TextOps.oracle ++ VocabOps.oracle ++
      MultimodalOps.oracle ++
      IngestOps.oracle ++ CorpusOps.oracle ++ Upsert.oracle ++
      PipelineOps.oracle ++ ReferencePipeline.oracle ++ GraphOps.oracle ++
      graft.streaming.StreamingOps.oracle
}
