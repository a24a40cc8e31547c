package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic lifecycle for `localCheckpoint()` blocks.
  *
  * Operators materialize multi-consumer intermediates with an eager
  * local checkpoint (cuts lineage + computes once). The checkpoint's
  * cached RDD blocks, however, are reclaimed only when the JVM
  * garbage-collects the RDD handle and the ContextCleaner notices —
  * in a long-lived library session that runs build/clear cycles, the
  * blocks accumulate on executors between GCs, invisible to
  * [[Memo.clear]] (which unpersists only what the memo itself
  * persisted). Every checkpoint therefore goes through [[eager]],
  * which registers the materialized RDD under its session; a
  * [[Memo.clear]] hook then unpersists all of them explicitly.
  *
  * Registered handles are strong references until release — bounded:
  * checkpoints hold bounded intermediates by design (§6), and one
  * clear drops every handle for the session.
  */
object Checkpoints {

  private val live =
    scala.collection.mutable.ListBuffer.empty[(SparkSession, org.apache.spark.rdd.RDD[_])]

  Memo.registerClearHook("checkpoints")(release)

  /** `df.localCheckpoint()` + registration for explicit release. */
  def eager(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint()
    org.apache.spark.sql.GraftColumnBridge.checkpointRdd(out).foreach { r =>
      live.synchronized { live += ((df.sparkSession, r)) }
    }
    out
  }

  /** Unpersist every registered checkpoint RDD of `s` (non-blocking —
    * the blocks drop asynchronously, the handles drop now). Runs as
    * a Memo.clear hook. */
  def release(s: SparkSession): Unit = {
    val mine = live.synchronized {
      val (m, rest) = live.partition(_._1 eq s)
      live.clear(); live ++= rest
      m.toList
    }
    mine.foreach(_._2.unpersist(blocking = false))
  }

  /** Registered-handle count for `s` (spec hook). */
  private[graft] def liveCount(s: SparkSession): Int =
    live.synchronized(live.count(_._1 eq s))
}
